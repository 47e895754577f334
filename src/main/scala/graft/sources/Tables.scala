package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.functions.Num._

/** Readers for the driver-provided parquet tables (TESTDATA.md) plus the
  * star-schema "payroll fact" view that instantiates the reference's data
  * model (reference `src/models.py:7-32`) over the synthetic TPC-H-ish data.
  *
  * Scale design: each reader is a plain parquet scan so Catalyst's
  * vectorized reader, column pruning and filter pushdown all apply. The
  * `fact` view is lazy composition — no staging tables (the reference's
  * `x_dept`/`x_emp`/`x_fact` staging, `src/etl.py:20,35,64`, disappears:
  * Spark plans compose without materialization).
  */
object Tables {
  // Explicit schema (Schemas.byName) instead of inference: drift fails at
  // analysis time, and at scale the footer-sampling inference pass is
  // skipped entirely (reference analog: DDL in src/models.py:4-33).
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(Schemas.byName(name)).parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (unreadable as TimestampType by the
    * vectorized reader — taken as raw nanos and truncated to µs, the
    * same truncation DuckDB applies) and plain µs TIMESTAMP (read
    * directly). Probe the footer-inferred type and pick the path; both
    * return a µs TimestampType `ts`. The probe is one driver-side footer
    * read per call — metadata-scale, like any file listing. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    s.read.parquet(path).schema("ts").dataType match {
      case tsType @ (TimestampType | TimestampNTZType) =>
        // µs file — NTZ (driver testdata) or instant (a Spark writer's
        // INT96/µs): declare the file's own flavor, then normalize NTZ
        // to TimestampType, a value-identity under the UTC session tz
        // (DuckDB's TIMESTAMP is the same naive-µs reading).
        val declared = org.apache.spark.sql.types.StructType(
          Schemas.eventsMicros.fields.map(f =>
            if (f.name == "ts") f.copy(dataType = tsType) else f))
        val df = s.read.schema(declared).parquet(path)
        if (tsType == TimestampNTZType) df.withColumn("ts", col("ts").cast(TimestampType))
        else df
      case _ =>
        // TIMESTAMP(NANOS) read as raw ns longs. Integral `div`, not
        // `/`: ns epoch values exceed 2^53, double division would
        // silently lose precision
        t(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Rebalance a compact input to the session's parallelism — ONLY when
    * the scan cannot produce one well-sized split per core (small/
    * single-file inputs), where one task would otherwise own an entire
    * downstream pipeline. At real scale the scan is already multi-split
    * and this is an identity (no shuffle added). Measured: the sf0.1
    * documents file is ONE split; per-row-heavy pipelines over it ran
    * 3-12× slower single-tasked.
    *
    * The decision reads the optimized plan's size statistic (file bytes
    * for a parquet scan) against `defaultParallelism ×
    * spark.sql.files.openCostInBytes` — the same floor the file-split
    * packer uses for a minimum worthwhile split. Pure analysis-time
    * inspection: no `.rdd` conversion (which would materialize the plan's
    * RDD lineage per call and bypass AQE's view of the query). */
  def balanced(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val par = s.sparkContext.defaultParallelism
    val openCost = s.conf.get("spark.sql.files.openCostInBytes", (4L << 20).toString).toLong
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(par) * openCost)
      df.repartition(par)
    else df
  }

  /** Predicate for "order falls in month m" (m = "yyyy-MM") expressed as a
    * raw range on `o_orderdate` so it PUSHES DOWN to the parquet scan.
    *
    * The reference filters `WHERE month = m` against a pre-truncated DATE
    * column backed by a B-tree index (`src/models.py:41-45`,
    * `src/api.py:34`). Filtering on `date_format(o_orderdate,'yyyy-MM')`
    * would compute a derived value per row and read the whole table; a
    * half-open range on the storage column instead reaches the scan as
    * `PushedFilters` and prunes row groups via parquet min/max stats — the
    * 100 TB-scale analog of the reference's month index.
    */
  private val MonthRe = "^\\d{4}-(0[1-9]|1[0-2])$".r

  /** Reject malformed month params up front (the reference gets this for
    * free from `(:m || '-01')::date` raising in Postgres). Also the guard
    * that keeps [[inMonthSql]] splices injection-safe: a validated yyyy-MM
    * cannot contain quotes. */
  def requireMonth(m: String): String = {
    require(MonthRe.findFirstIn(m).isDefined, s"month must be yyyy-MM, got: $m")
    m
  }

  /** Escape a string literal for splicing into oracle SQL. */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Correctly-rounded DECIMAL→DOUBLE boundary for oracle SQL. DuckDB's
    * direct decimal→double cast computes double(int128 unscaled) ÷
    * double(10^scale) — TWO roundings — and goes wrong by 1 ULP once
    * the unscaled value exceeds 2^53 (first observed at sf10: money
    * sums at scale 8 pass 10^16). Routing through VARCHAR prints the
    * exact digits and re-parses with strtod — ONE correct rounding,
    * matching the JVM's `BigDecimal.doubleValue` that [[graft.functions
    * .Num.dbl]] compiles to on the Spark side. Use this for every
    * decimal AGGREGATE crossing to double in oracle SQL; per-row money
    * values are far below the threshold and may cast directly. */
  def dblSql(e: String): String = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"

  def inMonth(c: org.apache.spark.sql.Column, m0: String): org.apache.spark.sql.Column = {
    val m = requireMonth(m0)
    val lo = java.sql.Timestamp.valueOf(s"$m-01 00:00:00")
    val hiYm = {
      val Array(y, mo) = m.split("-").map(_.toInt)
      if (mo == 12) f"${y + 1}%04d-01" else f"$y%04d-${mo + 1}%02d"
    }
    val hi = java.sql.Timestamp.valueOf(s"$hiYm-01 00:00:00")
    c >= lit(lo) && c < lit(hi)
  }

  /** Same predicate in DuckDB SQL for the oracle. */
  def inMonthSql(col: String, m0: String): String = {
    val m = requireMonth(m0)
    val Array(y, mo) = m.split("-").map(_.toInt)
    val hiYm = if (mo == 12) f"${y + 1}%04d-01" else f"$y%04d-${mo + 1}%02d"
    s"($col >= TIMESTAMP '$m-01 00:00:00' AND $col < TIMESTAMP '$hiYm-01 00:00:00')"
  }

  /** The payroll-fact analog: one row per lineitem with employee (customer),
    * department (nation) and month attached, and the reference's additive
    * measures (`src/models.py:22-29`) derived in exact decimal:
    *
    *   emp_id   <- o_custkey          gross  <- l_extendedprice
    *   dept     <- n_name             bonus  <- gross * l_discount
    *   month    <- yyyy-MM(o_orderdate)  overtime <- l_quantity * 10
    *   taxes    <- gross * l_tax      net    <- gross * (1 - l_discount)
    *   fte      <- l_quantity
    *
    * Join spine = the reference's star join J1 (`src/api.py:60-62`):
    * fact -> dim_employee -> dim_dept becomes
    * lineitem -> orders -> customer -> nation. `nation` (25 rows) is
    * explicitly broadcast — the analog of the reference's FK index
    * (`src/models.py:52-56`). `customer` is left to Catalyst/AQE: at test
    * scale it broadcasts automatically; at 100 TB it becomes a shuffle join
    * on the key, which is the correct plan there.
    *
    * `monthPred` (when given) is applied to `o_orderdate` BEFORE the joins
    * so it pushes into the orders scan.
    */
  def fact(s: SparkSession, d: String, months: Seq[String] = Nil): DataFrame = {
    val l = lineitem(s, d)
    val oAll = orders(s, d)
    val o =
      if (months.isEmpty) oAll
      else oAll.filter(months.map(m => inMonth(oAll("o_orderdate"), m)).reduce(_ || _))
    val c = customer(s, d)
    val n = nation(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        o("o_custkey").as("emp_id"),
        n("n_name").as("dept"),
        date_format(o("o_orderdate"), "yyyy-MM").as("month"),
        dec(l("l_extendedprice")).as("gross"),
        (dec(l("l_extendedprice")) * dec(l("l_discount"))).as("bonus"),
        (dec(l("l_quantity")) * lit(10)).as("overtime"),
        (dec(l("l_extendedprice")) * dec(l("l_tax"))).as("taxes"),
        (dec(l("l_extendedprice")) * (lit(1) - dec(l("l_discount")))).as("net"),
        dec(l("l_quantity")).as("fte"))
  }

  /** Oracle-side CTE mirroring [[fact]], with an optional pushed month
    * filter. Table names are bare — the driver registers the sf parquet
    * files as DuckDB views under their table names.
    */
  def factSql(monthPred: String = "TRUE"): String =
    s"""fact AS (
       |  SELECT o.o_custkey AS emp_id, n.n_name AS dept,
       |         strftime(o.o_orderdate, '%Y-%m') AS month,
       |         CAST(l.l_extendedprice AS DECIMAL(18,4)) AS gross,
       |         CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(l.l_discount AS DECIMAL(18,4)) AS bonus,
       |         CAST(l.l_quantity AS DECIMAL(18,4)) * 10 AS overtime,
       |         CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(l.l_tax AS DECIMAL(18,4)) AS taxes,
       |         CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS net,
       |         CAST(l.l_quantity AS DECIMAL(18,4)) AS fte
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  WHERE $monthPred
       |)""".stripMargin
}
