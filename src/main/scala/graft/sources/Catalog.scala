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

  def columnsSql: String = {
    val names = Schemas.byName.keys.toSeq.sorted.map(n => s"'$n'").mkString(", ")
    s"""SELECT table_name, column_name, CAST(ordinal_position AS INT) AS ordinal
       |FROM information_schema.columns
       |WHERE table_name IN ($names)
       |ORDER BY table_name, ordinal""".stripMargin
  }
}
