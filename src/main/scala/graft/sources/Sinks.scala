package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized write paths (S3/S7's layout half). The reference's month
  * B-tree index (`/root/reference/src/models.py:41-45`) has exactly one
  * 100 TB analog: a `partitionBy(month)` Parquet layout, so month-filtered
  * reads prune at the directory level before any I/O happens.
  */
object Sinks {

  /** Month-partitioned fact layout. Readers filtering on `month` get
    * partition pruning (`PruneFileSourcePartitions`) — the scan lists and
    * reads ONLY the matching month directories. */
  def writeFactPartitioned(df: DataFrame, path: String): Unit =
    df.write.partitionBy("month").mode("overwrite").parquet(path)

  /** Partition-scoped keyed upsert: merge `incoming` into the
    * month-partitioned table at `path`, rewriting ONLY the month
    * partitions that `incoming` touches (dynamic partition overwrite).
    *
    * This is the piece that makes the reference's "re-run the load"
    * idempotence affordable at 100 TB: a daily batch touching 1 month
    * rewrites 1/120th of a 10-year fact table, not all of it.
    *
    * Steps: semi-join existing rows down to affected months (partition
    * pruning makes that read cheap) -> keyed last-write-wins merge ->
    * [[graft.functions.Lineage.cut]] to cut the lineage on the source
    * path (Spark refuses to overwrite a path it is reading from) ->
    * dynamic-overwrite write.
    *
    * Production note: a table format with a transactional MERGE (Delta/
    * Iceberg) replaces the checkpoint dance; Parquet-only keeps the
    * reference's observable guarantee (idempotent re-runs), not atomicity.
    */
  def upsertFactPartitions(s: SparkSession, path: String, incoming: DataFrame,
                           keys: Seq[String]): Unit = {
    val existing = s.read.parquet(path)
      .join(broadcast(incoming.select("month").distinct()), Seq("month"), "left_semi")
    val merged = graft.functions.Lineage.cut(
      graft.operators.Merge.upsert(existing, incoming, keys)
        // align column order: partition column must be last for the writer
        .select(existing.columns.map(col).toSeq: _*))
    merged.write
      // per-write option, NOT the session conf: setting the session-wide
      // partitionOverwriteMode would silently turn every later overwrite
      // in the session into a partial (non-truncating) one
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("month").mode("overwrite").parquet(path)
  }

  /** Compact the streaming ingest's batch_id-partitioned band index
    * (written by [[graft.streaming.Streams.dedupIngest]]) into the
    * bucketed table whose shuffle-free incremental join LayoutSpec
    * proves. The maintenance job every continuously-appended layout
    * needs, doing two things in one pass: folds the accumulated small
    * batch partitions into `buckets` right-sized files (small-files
    * bound), and re-establishes the (band, bh) bucket layout so
    * subsequent batch joins stop re-shuffling the corpus side. Dedup by
    * the full row: a replayed batch's partition holds rows identical to
    * the original, and identical (doc_id, band, bh) rows carry no extra
    * information. */
  def compactBandIndex(s: SparkSession, indexPath: String, table: String,
                       buckets: Int = 8): Unit =
    s.read.parquet(indexPath)
      .select("doc_id", "band", "bh")
      .distinct()
      .write.bucketBy(buckets, "band", "bh").sortBy("band", "bh")
      .mode("overwrite").saveAsTable(table)
}
