package graft.sources

import org.apache.spark.sql.types._

/** Explicit StructType declarations for every input the engine reads —
  * the Spark analog of the reference's DDL (`/root/reference/src/models.py:4-33`):
  * schema is declared, not inferred, so drift fails loudly at analysis time
  * instead of silently changing query results.
  *
  * At 100 TB scale explicit schemas also skip the footer-sampling schema
  * inference pass (a full file-listing + footer read on huge datasets) and
  * pin the timestamp/decimal semantics the oracle compare depends on.
  *
  * Testdata schemas transcribed from the driver's parquet files
  * (TESTDATA.md); the payroll CSV schema mirrors the reference's raw input
  * (`/root/reference/data/payroll.csv:1` header) — all STRING at the scan,
  * because the reference reads it with pandas type inference and then
  * explicitly coerces each column (`src/etl.py:6-12`); our cleanse stage
  * (graft.operators.Etl) owns the coercion, the scan stays faithful to
  * "raw text in".
  */
object Schemas {
  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  // `ts` arrives in two physical encodings across testdata generations:
  // TIMESTAMP(NANOS) (which Spark's vectorized reader cannot decode as
  // TimestampType — read as raw nanos LongType via
  // spark.sql.legacy.parquet.nanosAsLong, then truncated to µs by
  // Tables.events, the same truncation DuckDB applies) and plain µs
  // TIMESTAMP (read directly with `eventsMicros`). Tables.events probes
  // the parquet footer and picks the right schema; either way the frame
  // it returns carries a µs TimestampType `ts`.
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The µs-TIMESTAMP encoding of `events` (see comment above). */
  val eventsMicros: StructType = StructType(
    events.fields.map(f =>
      if (f.name == "ts") StructField("ts", TimestampType) else f))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val byName: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Raw payroll CSV (reference `data/payroll.csv:1` header order), plus a
    * trailing ingest sequence id our fixtures carry to make "keep first
    * occurrence" dedup (pandas `drop_duplicates`, `src/etl.py:33`)
    * deterministic across engines: file order is not a contract in either
    * Spark or DuckDB, an explicit sequence column is. */
  val payrollRaw: StructType = StructType(
    Seq("emp_id", "dept", "job_grade", "fte", "month", "gross", "bonus",
      "overtime", "taxes", "deductions", "net", "hours_worked", "location",
      "currency", "seq").map(StructField(_, StringType)))
}
