package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: catalog introspection — the reference's `pg_indexes` diagnostics
  * (`/root/reference/scripts/show_indexes.py:4-12`) generalized to "what
  * tables/columns does the engine serve". Spark analog of
  * `information_schema.columns`, derived from the declared schemas the
  * readers actually enforce (Schemas.byName), so the answer is the truth
  * the engine operates on, not a re-inference.
  */
object Catalog {
  /** One row per (table, column): table_name, column_name, ordinal (1-based). */
  def columns(s: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = Schemas.byName.toSeq.sortBy(_._1).flatMap { case (t, schema) =>
      schema.fields.zipWithIndex.map { case (f, i) =>
        org.apache.spark.sql.Row(t, f.name, i + 1)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("table_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("column_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ordinal", org.apache.spark.sql.types.IntegerType)))
    s.createDataFrame(rows.asJava, schema)
  }

  /** Data-level profiling — the other half of introspection: per-column
    * row/non-null/distinct counts and lexicographic min/max (everything
    * profiled through its string form so one output schema fits all
    * column types). ONE pass over the table: a single aggregate computes
    * every statistic (count-distincts expand map-side as usual), then a
    * `stack` unpivots the 1-row result — no per-column rescans. The
    * standard pre-ingest data-quality gate at corpus scale (schema drift,
    * null floods, and key collapse all surface here before a bad batch
    * merges). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("string")).as(s"${c}__mn"),
        max(col(c).cast("string")).as(s"${c}__mx"))
    } :+ count(lit(1)).as("__n")
    val arms = cols.map(c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n").as("n_rows"),
        expr(s"stack(${cols.size}, $arms) AS (col_name, n_nonnull, n_distinct, min_str, max_str)"))
      .select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str")
      .orderBy("col_name")
  }

  def qProfile(s: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(s, dir), Schemas.byName("documents").fieldNames.toSeq)

  def qProfileSql: String = {
    val arms = Schemas.byName("documents").fieldNames.toSeq.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
         |       COUNT(DISTINCT $c) AS n_distinct,
         |       MIN(CAST($c AS VARCHAR)) AS min_str, MAX(CAST($c AS VARCHAR)) AS max_str
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$arms\n) ORDER BY col_name"
  }

  /** 2^61: modulus keeping the commutative hash-sum in signed int64. */
  val Mod61 = 2305843009213693952L

  /** Orderless per-partition table fingerprint — the cross-engine data
    * validation primitive: after any migration/backfill/merge, comparing
    * (n_rows, sum_hash, xor_hash) per month partition pinpoints exactly
    * which partitions diverge without moving data between systems. Every
    * ingredient is deliberately order-independent and engine-portable:
    * the row hash is the md5-based 60-bit int ([[graft.functions.Hashes]]),
    * doubles enter the canonical string as exact integer CENTS (decimal
    * scale-up, never double→string formatting), the timestamp as an
    * explicit-format string, and the two combiners (modular SUM,
    * BIT_XOR) commute — so the fingerprint is invariant to partitioning,
    * task order, and engine. One scan, one keyed shuffle on month;
    * partials combine map-side. The sum rides exact DECIMAL(38,0)
    * internally but lands as `% 2^61` in int64: every output column is
    * then plain BIGINT, so any fetch path (arrow, pandas, duckdb) yields
    * the identical native type — a DECIMAL(38,0) OUTPUT column
    * round-trips as Decimal/float/str depending on the reader and broke
    * the r05 driver compare even though the values matched
    * (CORRECTNESS_r05: rows+schema ok, hash mismatch; tools/check.py's
    * str() compare passed on the same dump). */
  def checksum(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Num.dec
    val canon = concat_ws("|",
      col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
      col("o_orderstatus"),
      (dec(col("o_totalprice")) * lit(10000)).cast("long").cast("string"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
      col("o_orderpriority"))
    orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        graft.functions.Hashes.hash60(canon).as("h"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_rows"),
        // exact decimal partial sums, one final mod back into int64
        (sum(col("h").cast("decimal(38,0)")) % lit(Mod61))
          .cast("long").as("sum_hash"),
        expr("bit_xor(h)").as("xor_hash"))
  }

  def qChecksum(s: SparkSession, dir: String): DataFrame =
    checksum(Tables.orders(s, dir)).orderBy("month")

  def qChecksumSql: String =
    """WITH rows_h AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |         CAST('0x' || substr(md5(concat_ws('|',
      |           o_orderkey, o_custkey, o_orderstatus,
      |           CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT),
      |           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
      |           o_orderpriority)), 1, 15) AS BIGINT) AS h
      |  FROM orders)
      |SELECT month, COUNT(*) AS n_rows,
      |       CAST(SUM(h) % 2305843009213693952 AS BIGINT) AS sum_hash,
      |       BIT_XOR(h) AS xor_hash
      |FROM rows_h GROUP BY month ORDER BY month""".stripMargin

  val HistBuckets = 20

  /** Equi-width histogram of a money column with data-driven bounds —
    * the profiling companion to [[profile]]'s min/max: distribution
    * shape, not just range. Two stages: a tiny min/max aggregate, then
    * one scan with the 1-row bounds broadcast onto it — never a
    * per-bucket rescan. All bucket math is INTEGER (floor to whole
    * units, ceil-divided width): identical arithmetic in both engines,
    * no float boundary flips. Empty buckets are absent (same contract
    * both sides); sums are exact decimal until the final cast. */
  def histogram(df: DataFrame, valueCol: String, buckets: Int = HistBuckets): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Num.{dbl, dec}
    val v = floor(dec(col(valueCol))).cast("long")
    // integral `div`, never `/`: Column./ is true division (double) and
    // a float boundary flip would move edge rows across buckets
    val bounds = df.agg(min(v).as("lo"), (max(v) + 1).as("hi"))
      .select(col("lo"), expr(s"(hi - lo + ${buckets - 1}) div $buckets").as("w"))
    df.select(v.as("fv"), dec(col(valueCol)).as("dv"))
      .join(broadcast(bounds))
      .select(expr("(fv - lo) div w").as("bucket"),
        col("lo"), col("w"), col("dv"))
      .groupBy("bucket", "lo", "w")
      .agg(count(lit(1)).as("n"), dbl(sum(col("dv"))).as("sum_value"))
      .select(col("bucket").cast("int").as("bucket"),
        (col("lo") + col("bucket") * col("w")).as("bucket_lo"),
        (col("lo") + (col("bucket") + 1) * col("w")).as("bucket_hi"),
        col("n"), col("sum_value"))
  }

  def qHistogram(s: SparkSession, dir: String): DataFrame =
    histogram(Tables.orders(s, dir), "o_totalprice").orderBy("bucket")

  def qHistogramSql: String =
    s"""WITH vals AS (
       |  SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(18,4))) AS BIGINT) AS fv,
       |         CAST(o_totalprice AS DECIMAL(18,4)) AS dv
       |  FROM orders),
       |bounds AS (
       |  SELECT MIN(fv) AS lo,
       |         (MAX(fv) + 1 - MIN(fv) + $HistBuckets - 1) // $HistBuckets AS w
       |  FROM vals),
       |bucketed AS (
       |  SELECT (fv - lo) // w AS bucket, lo, w, dv FROM vals, bounds)
       |SELECT CAST(bucket AS INT) AS bucket,
       |       lo + bucket * w AS bucket_lo,
       |       lo + (bucket + 1) * w AS bucket_hi,
       |       COUNT(*) AS n,
       |       CAST(SUM(dv) AS DOUBLE) AS sum_value
       |FROM bucketed GROUP BY bucket, lo, w ORDER BY bucket""".stripMargin

  def columnsSql: String = {
    val names = Schemas.byName.keys.toSeq.sorted.map(n => s"'$n'").mkString(", ")
    s"""SELECT table_name, column_name, CAST(ordinal_position AS INT) AS ordinal
       |FROM information_schema.columns
       |WHERE table_name IN ($names)
       |ORDER BY table_name, ordinal""".stripMargin
  }

  // -------------------------------------------------------------------
  // Rule-based data-quality audit
  // -------------------------------------------------------------------
  /** Accepted event types — `error` is deliberately NOT accepted: an
    * expectations audit that never fires proves nothing, and the error
    * events are exactly the rows a pipeline quarantines. */
  val AcceptedEventTypes: Seq[String] = Seq("click", "signup", "view", "purchase")

  /** Declarative expectations audit (the Deequ/dbt-tests shape): each
    * rule yields (rule, n_checked, n_violations, pass). Execution cost
    * is what matters at 100 TB: all of a table's predicate rules fold
    * into ONE single-pass aggregate over that table (conditional counts,
    * map-side combined — adding a rule adds a column, not a scan), then
    * a row-per-rule explode of the 1-row result. The only rule that
    * cannot fuse is referential integrity: the FK anti-join is its own
    * keyed join (shuffle bounded by the two key columns; at scale the
    * dim side broadcasts or the join runs on the bucketed layout). */
  def audit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def viol(pred: org.apache.spark.sql.Column) = count(when(pred, 1))
    def unpack(agg: DataFrame, rules: Seq[String]): DataFrame =
      agg.select(explode(array(rules.map(r => struct(
          lit(r).as("rule"), col("n").as("n_checked"),
          col(s"v_$r").as("n_violations"))): _*)).as("r"))
        .select(col("r.rule"), col("r.n_checked"), col("r.n_violations"))

    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val e = Tables.events(s, dir)
    val d = Tables.documents(s, dir)

    val ordersAgg = o.agg(count(lit(1)).as("n"),
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("v_orders_pk_unique"),
      viol(col("o_totalprice").isNull || col("o_totalprice") <= 0)
        .as("v_orders_totalprice_positive"))
    val custAgg = c.agg(count(lit(1)).as("n"),
      viol(col("c_acctbal") < 0).as("v_customer_acctbal_nonneg"))
    val eventsAgg = e.agg(count(lit(1)).as("n"),
      viol(!col("event_type").isin(AcceptedEventTypes: _*)).as("v_events_type_accepted"),
      viol(col("value").isNull || col("value") <= 0).as("v_events_value_positive"))
    val docsAgg = d.agg(count(lit(1)).as("n"),
      viol(col("text").isNull || length(trim(col("text"))) === 0)
        .as("v_documents_text_nonempty"))
    val fkRow = o.agg(count(lit(1)).as("n"))
      .crossJoin(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v")))
      .select(lit("orders_fk_customer").as("rule"),
        col("n").as("n_checked"), col("v").as("n_violations"))

    unpack(ordersAgg, Seq("orders_pk_unique", "orders_totalprice_positive"))
      .unionAll(unpack(custAgg, Seq("customer_acctbal_nonneg")))
      .unionAll(unpack(eventsAgg, Seq("events_type_accepted", "events_value_positive")))
      .unionAll(unpack(docsAgg, Seq("documents_text_nonempty")))
      .unionAll(fkRow)
      .withColumn("pass", col("n_violations") === 0)
  }

  def qAudit(s: SparkSession, dir: String): DataFrame =
    audit(s, dir).orderBy("rule")

  /** Benford first-digit expectations log10(1 + 1/d), computed ONCE in
    * Scala and embedded as the same double literals in both engines —
    * evaluating log10 inside either engine would reintroduce the
    * last-ulp libm divergence the hash gate forbids. */
  val BenfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford's-law first-digit audit of a money column — the classic
    * fraud/synthetic-data screen: the leading-digit distribution of
    * natural multi-scale amounts follows log10(1+1/d); fabricated or
    * truncated data shows up as a deviating digit profile. The leading
    * digit is taken from the EXACT integer cents (decimal scale-up then
    * int-to-string — both engines print integers identically; a double's
    * decimal formatting is engine-dependent and never touches this
    * path). One scan, one 9-group aggregate, the total joined back as a
    * broadcast 1-row frame; share/deviation are single IEEE divisions
    * of exact longs, deterministic in both engines. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Num.dec
    val s = df.sparkSession
    import s.implicits._
    val cents = (dec(col(valueCol)) * lit(10000)).cast("long")
    val digits = df.filter(col(valueCol) > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = BenfordExpected.toDF("digit", "expected")
    digits
      .crossJoin(broadcast(digits.agg(sum("n").as("total"))))
      .join(broadcast(expected), "digit")
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("total")).as("share"),
        col("expected"),
        abs(col("n").cast("double") / col("total") - col("expected")).as("abs_dev"))
  }

  def qBenford(s: SparkSession, dir: String): DataFrame =
    benford(Tables.orders(s, dir), "o_totalprice").orderBy("digit")

  def qBenfordSql: String = {
    // STRING-cast literals: DuckDB parses a bare numeric literal as
    // DECIMAL then converts, losing the last ulp vs the JVM double;
    // CAST('<repr>' AS DOUBLE) is a correctly-rounded parse of the same
    // shortest round-trip representation
    val expectedValues = BenfordExpected
      .map { case (d, e) => s"($d, CAST('$e' AS DOUBLE))" }.mkString(", ")
    s"""WITH expected(digit, expected) AS (VALUES $expectedValues),
       |digits AS (
       |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
       |         COUNT(*) AS n
       |  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
       |tot AS (SELECT SUM(n) AS total FROM digits)
       |SELECT digit, n,
       |       CAST(n AS DOUBLE) / total AS share,
       |       expected,
       |       abs(CAST(n AS DOUBLE) / total - expected) AS abs_dev
       |FROM digits CROSS JOIN tot JOIN expected USING (digit)
       |ORDER BY digit""".stripMargin
  }

  /** The two comparison windows for the drift report (full years, both
    * populated in the testdata's 1995-2001 span). */
  val DriftYearA = 1996
  val DriftYearB = 1999

  /** Two-sample distribution-drift report — the monitoring op a pipeline
    * runs between a reference window and a fresh batch before merging:
    * bucket the money column with the SAME integer-exact edges for both
    * windows (bounds from the union, so a shifted batch cannot escape
    * the grid), count per (bucket, window) in ONE conditional-arm
    * aggregate over one scan, and report per-bucket shares, share
    * deltas, and the chi-square-style contribution
    * (Δshare² / (share_a + share_b)) — deliberately NOT a PSI/KL score:
    * those need `ln`, whose last-ulp engine divergence the hash gate
    * forbids, and the per-bucket table is the actionable artifact
    * anyway (WHERE did the mass move, not just how much). All drift
    * arithmetic is single IEEE ops on exact longs — deterministic. The
    * year predicates push to the parquet scan as an OR of date ranges;
    * totals ride a broadcast 1-row frame. */
  def drift(orders: DataFrame, buckets: Int = HistBuckets): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Num.dec
    def inYear(y: Int) =
      col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp")
    val two = orders.filter(inYear(DriftYearA) || inYear(DriftYearB))
      .select(floor(dec(col("o_totalprice"))).cast("long").as("fv"),
        (year(col("o_orderdate")) === DriftYearA).as("is_a"))
    val bounds = two.agg(min(col("fv")).as("lo"), (max(col("fv")) + 1).as("hi"))
      .select(col("lo"), expr(s"(hi - lo + ${buckets - 1}) div $buckets").as("w"))
    val counted = two.join(broadcast(bounds))
      .select(expr("(fv - lo) div w").as("bucket"), col("lo"), col("w"), col("is_a"))
      .groupBy("bucket", "lo", "w")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
    val totals = counted.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    val shareA = col("n_a").cast("double") / col("tot_a")
    val shareB = col("n_b").cast("double") / col("tot_b")
    counted.crossJoin(broadcast(totals))
      .withColumn("share_a", shareA)
      .withColumn("share_b", shareB)
      .withColumn("delta_share", col("share_a") - col("share_b"))
      .withColumn("chi2_term",
        col("delta_share") * col("delta_share") / (col("share_a") + col("share_b")))
      .select(col("bucket").cast("int").as("bucket"),
        (col("lo") + col("bucket") * col("w")).as("bucket_lo"),
        (col("lo") + (col("bucket") + 1) * col("w")).as("bucket_hi"),
        col("n_a"), col("n_b"), col("share_a"), col("share_b"),
        col("delta_share"), col("chi2_term"))
  }

  def qDrift(s: SparkSession, dir: String): DataFrame =
    drift(Tables.orders(s, dir)).orderBy("bucket")

  def qDriftSql: String =
    s"""WITH two AS (
       |  SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(18,4))) AS BIGINT) AS fv,
       |         year(o_orderdate) = $DriftYearA AS is_a
       |  FROM orders
       |  WHERE (o_orderdate >= '$DriftYearA-01-01' AND o_orderdate < '${DriftYearA + 1}-01-01')
       |     OR (o_orderdate >= '$DriftYearB-01-01' AND o_orderdate < '${DriftYearB + 1}-01-01')),
       |bounds AS (
       |  SELECT MIN(fv) AS lo,
       |         (MAX(fv) + 1 - MIN(fv) + $HistBuckets - 1) // $HistBuckets AS w
       |  FROM two),
       |counted AS (
       |  SELECT (fv - lo) // w AS bucket, lo, w,
       |         SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
       |         SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS n_b
       |  FROM two, bounds GROUP BY 1, 2, 3),
       |tot AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b FROM counted),
       |r AS (
       |  SELECT bucket, lo, w, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |         CAST(n_a AS DOUBLE) / tot_a AS share_a,
       |         CAST(n_b AS DOUBLE) / tot_b AS share_b
       |  FROM counted CROSS JOIN tot)
       |SELECT CAST(bucket AS INT) AS bucket,
       |       lo + bucket * w AS bucket_lo,
       |       lo + (bucket + 1) * w AS bucket_hi,
       |       n_a, n_b, share_a, share_b,
       |       share_a - share_b AS delta_share,
       |       (share_a - share_b) * (share_a - share_b) / (share_a + share_b) AS chi2_term
       |FROM r ORDER BY bucket""".stripMargin

  def qAuditSql: String = {
    val accepted = AcceptedEventTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH r AS (
       |  SELECT 'orders_pk_unique' AS rule, COUNT(*) AS n_checked,
       |         COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
       |  UNION ALL
       |  SELECT 'orders_totalprice_positive', COUNT(*),
       |         COUNT(*) FILTER (o_totalprice IS NULL OR o_totalprice <= 0) FROM orders
       |  UNION ALL
       |  SELECT 'customer_acctbal_nonneg', COUNT(*),
       |         COUNT(*) FILTER (c_acctbal < 0) FROM customer
       |  UNION ALL
       |  SELECT 'events_type_accepted', COUNT(*),
       |         COUNT(*) FILTER (event_type NOT IN ($accepted)) FROM events
       |  UNION ALL
       |  SELECT 'events_value_positive', COUNT(*),
       |         COUNT(*) FILTER (value IS NULL OR value <= 0) FROM events
       |  UNION ALL
       |  SELECT 'documents_text_nonempty', COUNT(*),
       |         COUNT(*) FILTER (text IS NULL OR length(trim(text)) = 0) FROM documents
       |  UNION ALL
       |  SELECT 'orders_fk_customer', (SELECT COUNT(*) FROM orders),
       |         COUNT(*) FROM orders o
       |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
       |SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
       |FROM r ORDER BY rule""".stripMargin
  }

  /** Equi-depth bucket count (deciles). */
  val DepthBuckets = 10

  /** Equi-DEPTH histogram (the optimizer-statistics dual of the
    * equi-width [[histogram]]): bucket edges are the exact decile cut
    * points, so every bucket holds ~1/k of the rows — the histogram
    * shape selectivity estimation actually wants on skewed data, where
    * equi-width piles everything into two buckets. NOT ntile: ntile
    * needs one global-order window (single partition — disqualifying at
    * scale). Two passes instead: (1) one sort-based spillable aggregate
    * computes all k−1 interior cuts (`percentile` with an array — same
    * interpolation DuckDB's quantile_cont uses, already proven bit-equal
    * by kpi_quartiles); (2) bucket = Σ [v > cut_j], an in-row comparison
    * against the broadcast 1-row cut array, then a k-group count. At
    * 100 TB swap pass 1 for approx_percentile or distributed order
    * statistics ([[graft.functions.ScalableMedian]]) — pass 2 is
    * already scan-shaped. */
  def histogramDepth(df: DataFrame, valueCol: String,
                     buckets: Int = DepthBuckets): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Num.{dbl, dec}
    val v = dbl(dec(col(valueCol)))
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val cuts = df.agg(expr(
      s"percentile(CAST(CAST($valueCol AS DECIMAL(18,4)) AS DOUBLE), array(${ps.mkString(",")}))")
      .as("cuts"))
    df.select(v.as("v")).crossJoin(broadcast(cuts))
      .withColumn("bucket",
        aggregate(col("cuts"), lit(0),
          (acc, c) => acc + when(col("v") > c, 1).otherwise(0)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

  def qHistogramDepth(s: SparkSession, dir: String): DataFrame =
    histogramDepth(graft.sources.Tables.orders(s, dir), "o_totalprice")
      .orderBy("bucket")

  def qHistogramDepthSql: String = {
    val ps = (1 until DepthBuckets).map(i => i.toDouble / DepthBuckets)
    s"""WITH cuts AS (
       |  SELECT quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE),
       |                       [${ps.mkString(",")}]) AS cs
       |  FROM orders),
       |b AS (
       |  SELECT len(list_filter(cs, c -> CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) > c)) AS bucket,
       |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS v
       |  FROM orders, cuts)
       |SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
       |       MIN(v) AS lo, MAX(v) AS hi
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** Numeric lineitem columns profiled by [[corrReport]] (short alias ->
    * source column); pairs are the upper triangle of interest. */
  val CorrCols: Seq[(String, String)] = Seq(
    "qty" -> "l_quantity", "price" -> "l_extendedprice",
    "disc" -> "l_discount", "tax" -> "l_tax")
  val CorrPairs: Seq[(String, String)] = Seq(
    ("qty", "price"), ("qty", "disc"), ("price", "tax"), ("disc", "tax"))

  /** Pairwise correlation screen over the numeric fact columns — the
    * profiling step that catches derived/leaking/constant columns before
    * a column ships as a training feature. Emits, per pair, the exact
    * integer covariance moments (num = n·Σxy−ΣxΣy, den terms
    * dx = n·Σx²−(Σx)², dy) and a SIGNED r² — r² rather than r because r
    * needs sqrt and a float ratio of floats, while signed r² divides two
    * products of EXACT integers exactly once at the very end: values are
    * integerized ×10⁴ through DECIMAL(18,4) (the money discipline), all
    * moments accumulate in DECIMAL(38,0)/HUGEINT integer arithmetic, and
    * the only doubles are the final casts (correctly rounded in both
    * engines) and one mul/div chain in identical order. Zero-variance
    * columns yield NULL, not a 0/0 NaN.
    *
    * Scale shape: ONE map-side-combinable aggregate pass computes every
    * Σx, Σx², Σxy (no per-pair re-scan, no corr() UDAF per pair); the
    * pair table is built by exploding a literal array over the 1-row
    * result. At ~1e12 rows the ×10⁴ moments approach DECIMAL(38)'s
    * ceiling — shard the aggregate by month partition and merge, or drop
    * the integerization to ×10² for the widest columns. */
  def corrReport(li: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Num.dec
    def xi(alias: String) =
      (dec(col(CorrCols.toMap.apply(alias))) * lit(10000)).cast("decimal(38,0)")
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val moments =
      CorrCols.flatMap { case (a, _) => Seq(
        sum(xi(a)).as(s"s_$a"), sum(d38(xi(a) * xi(a))).as(s"ss_$a")) } ++
      CorrPairs.map { case (a, b) => sum(d38(xi(a) * xi(b))).as(s"sp_${a}_$b") }
    val sums = li.agg(count(lit(1)).as("n"), moments: _*)
    val pairRows = CorrPairs.map { case (a, b) =>
      struct(lit(a).as("x_col"), lit(b).as("y_col"),
        d38(d38(col("n")) * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")).as("num"),
        d38(d38(col("n")) * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")).as("dx"),
        d38(d38(col("n")) * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")).as("dy"))
    }
    sums.select(col("n"), explode(array(pairRows: _*)).as("p"))
      .select(col("p.x_col").as("x_col"), col("p.y_col").as("y_col"), col("n"),
        col("p.num").cast("double").as("num"),
        col("p.dx").cast("double").as("dx"),
        col("p.dy").cast("double").as("dy"))
      .withColumn("r2_signed",
        when(col("dx") > 0 && col("dy") > 0,
          (when(col("num") < 0, lit(-1.0)).otherwise(lit(1.0)))
            * col("num") * col("num") / (col("dx") * col("dy"))))
  }

  def qCorr(s: SparkSession, dir: String): DataFrame =
    corrReport(graft.sources.Tables.lineitem(s, dir)).orderBy("x_col", "y_col")

  def qCorrSql: String = {
    val xis = CorrCols.map { case (a, c) =>
      s"CAST(CAST($c AS DECIMAL(18,4)) * 10000 AS HUGEINT) AS $a" }.mkString(",\n         ")
    val moments = (CorrCols.map { case (a, _) =>
      s"SUM($a) AS s_$a, SUM($a*$a) AS ss_$a" } ++
      CorrPairs.map { case (a, b) => s"SUM($a*$b) AS sp_${a}_$b" })
      .mkString(",\n         ")
    val arms = CorrPairs.map { case (a, b) =>
      s"""SELECT '$a' AS x_col, '$b' AS y_col, n,
         |         n*sp_${a}_$b - s_$a*s_$b AS num,
         |         n*ss_$a - s_$a*s_$a AS dx,
         |         n*ss_$b - s_$b*s_$b AS dy FROM s""".stripMargin }
      .mkString("\n  UNION ALL ")
    s"""WITH x AS (
       |  SELECT $xis
       |  FROM lineitem),
       |s AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
       |         $moments
       |  FROM x),
       |p AS (
       |  $arms)
       |SELECT x_col, y_col, CAST(n AS BIGINT) AS n,
       |       CAST(num AS DOUBLE) AS num,
       |       CAST(dx AS DOUBLE) AS dx,
       |       CAST(dy AS DOUBLE) AS dy,
       |       CASE WHEN CAST(dx AS DOUBLE) > 0 AND CAST(dy AS DOUBLE) > 0 THEN
       |         (CASE WHEN CAST(num AS DOUBLE) < 0 THEN -1.0 ELSE 1.0 END)
       |           * CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
       |           / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))
       |       END AS r2_signed
       |FROM p ORDER BY x_col, y_col""".stripMargin
  }
}
