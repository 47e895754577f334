package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge primitives — the Spark expression of the reference's
  * Postgres upsert semantics (`/root/reference/src/etl.py:21-77`,
  * `scripts/load_once.py:46-70`):
  *
  *   - `ON CONFLICT (k) DO NOTHING`  -> [[insertIfAbsent]]
  *   - `ON CONFLICT (k) DO UPDATE`   -> [[upsert]] (incoming wins)
  *   - pandas `drop_duplicates(k)`   -> [[keepFirst]]
  *
  * Scale design: each primitive is a single keyed anti-join plus a union —
  * at 100 TB both sides shuffle-partition on the merge key once (or the
  * small side broadcasts under AQE); no driver-side collection anywhere.
  * The reference's staging tables disappear: Spark plans compose lazily.
  * Cross-table transactionality is NOT preserved (Parquet has no
  * multi-table commit) — the observable guarantee that survives is the
  * reference's real contract: idempotent re-runs (load twice == load once),
  * which all three primitives provide and the tests pin.
  */
object Merge {

  /** `INSERT … ON CONFLICT DO NOTHING`: keep every existing row, add only
    * incoming rows whose key is absent. Idempotent. */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(incoming.join(existing, keys, "left_anti"))

  /** `INSERT … ON CONFLICT DO UPDATE` (last-write-wins by key): incoming
    * replaces existing on key collision. Incoming must be key-unique —
    * enforce upstream with [[keepFirst]] (Postgres would reject a batch
    * that updates the same row twice). Idempotent. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(incoming, keys, "left_anti").unionByName(incoming)

  /** pandas `drop_duplicates(keys)` keep-first, made deterministic: "first"
    * is defined by `ord` (an explicit ingest-sequence column; plain
    * columns sort ascending, or pass `.desc` for keep-latest), not by
    * file or partition order — the only definition that is stable across
    * Spark partitionings AND reproducible in a SQL oracle. */
  def keepFirst(df: DataFrame, keys: Seq[String], ord: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
