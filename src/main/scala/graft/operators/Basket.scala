package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Market-basket co-occurrence analysis (association rules) over the
  * order/part star: which brand pairs appear in the same order more
  * often than independence predicts. The classic retail-analytics read
  * path the reference's SQL surface stops short of, and a standard
  * corpus-level co-occurrence primitive (the same dataflow scores token
  * or label co-occurrence).
  *
  * Scale shape: pairs are generated IN-ROW from each order's sorted
  * brand set (k·(k−1)/2 per basket, k = distinct brands per order — a
  * small constant), never by self-joining the exploded (order, brand)
  * frame, whose join would shuffle the corpus twice and explode
  * skewed orders quadratically in the join buffer. One keyed aggregate
  * builds the baskets (collect_set dedups in the partial), one counts
  * pairs, one dim-sized aggregate counts per-brand order frequencies;
  * the support/confidence/lift arithmetic is exact integer products
  * with one IEEE division each (products stay far under 2^53).
  * Top-k via orderBy+limit = TakeOrderedAndProject, no full sort.
  */
object Basket {
  val TopK = 30

  def pairs(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val byOrder = lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
    // all ordered pairs (a < b) of the sorted set, built array-side
    val combos = flatten(transform(col("bs"), (x, i) =>
      transform(slice(col("bs"), i + lit(2), size(col("bs"))),
        y => struct(x.as("a"), y.as("b")))))
    val pairCounts = byOrder
      .select(explode(combos).as("p"))
      .groupBy(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    val brandCounts = byOrder
      .select(explode(col("bs")).as("brand"))
      .groupBy("brand").agg(count(lit(1)).as("n"))
    val nOrders = byOrder.agg(count(lit(1)).as("n_orders"))
    pairCounts
      .join(broadcast(brandCounts.select(col("brand").as("brand_a"), col("n").as("n_a"))), "brand_a")
      .join(broadcast(brandCounts.select(col("brand").as("brand_b"), col("n").as("n_b"))), "brand_b")
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_orders"),
        (col("n_ab").cast("double") / col("n_orders")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"),
        ((col("n_ab") * col("n_orders")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("n_ab").desc, col("brand_a"), col("brand_b"))
      .limit(TopK)
  }

  def qBasket(s: SparkSession, dir: String): DataFrame =
    pairs(Tables.lineitem(s, dir), Tables.part(s, dir))

  def qBasketSql: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |pc AS (
       |  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_ab
       |  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.brand < b.brand
       |  GROUP BY 1, 2),
       |bc AS (SELECT brand, COUNT(*) AS n FROM baskets GROUP BY brand),
       |no AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM baskets)
       |SELECT brand_a, brand_b, n_ab,
       |       ca.n AS n_a, cb.n AS n_b, n_orders,
       |       CAST(n_ab AS DOUBLE) / n_orders AS support,
       |       CAST(n_ab AS DOUBLE) / ca.n AS confidence,
       |       CAST(n_ab * n_orders AS DOUBLE) / CAST(ca.n * cb.n AS DOUBLE) AS lift
       |FROM pc
       |JOIN bc ca ON ca.brand = pc.brand_a
       |JOIN bc cb ON cb.brand = pc.brand_b
       |CROSS JOIN no
       |ORDER BY n_ab DESC, brand_a, brand_b LIMIT $TopK""".stripMargin
}
