package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.operators.{Events, TimeJoin}
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Streaming ≡ batch equivalence, recorded as a gate artifact (VERDICT
  * r9 next-round #5): every operator in [[graft.streaming.Streams]] runs
  * against REAL scaled data (default testdata-sf1, 1 M events / 50 k
  * docs) through genuine multi-batch streams, and its finalized output
  * is compared ROW-FOR-ROW with the DuckDB-gated batch twin. One JSON
  * line per run (STREAMEQ artifact), same spirit as the CORRECTNESS
  * files — the streaming layer's evidence stops being test-only.
  *
  * Equivalence contracts per check (each `identical` = both `except`
  * directions empty):
  *
  *  - windows_file_stream: `hourlyWindows` over a maxFilesPerTrigger=4
  *    FILE stream of the events table (the deployment source), Complete
  *    mode, vs `Events.tumbling`. Decimal sums — exact across engines
  *    and batch boundaries.
  *  - cdc_complete: the literal `Events.cdcApply` FUNCTION on an
  *    unbounded frame (Spark's unified API), Complete mode, vs itself on
  *    the batch frame. Exercises incremental max(struct)/count/sum state.
  *  - sessions: `sessionize` fed event-time-ordered chunks (the
  *    operator's in-order delivery contract; out-of-order buffering is
  *    funnelStages' domain), flushed by watermark sentinels, vs
  *    `Events.sessions`. EXACT compare including sums — the operator
  *    accumulates the same 1e-4-unit decimals the batch `dec()` cast
  *    sums, at µs-exact gap arithmetic.
  *  - funnel: `funnelStages` fed time-aligned chunks each INTERNALLY
  *    SHUFFLED — its exactness-under-reorder claim, exercised across a
  *    multi-day reorder horizon per batch while honoring the watermark
  *    contract (arrivals >2 h late are dropped by design, so a full-
  *    range shuffle would test lateness policy, not reordering) —
  *    pivoted to per-user (t1,t2,t3), vs `Events.funnelUsers`. Exact
  *    epoch-µs longs.
  *  - dedup: `dropDuplicatesWithinWatermark` over ordered chunks plus a
  *    10% re-delivery batch, parquet sink, vs batch DISTINCT. A
  *    re-delivered row is dropped whether the state (dup) or the
  *    watermark (late) catches it — either way absent.
  *  - upsert: `upsertStream` keyed by user_id (ord = desc(ts, event_id))
  *    fed ordered chunks, vs `Merge.keepFirst` — last-write-wins ≡
  *    greatest-(ts,tie)-wins exactly when arrival respects event time,
  *    which ordered chunks guarantee.
  *  - attribution: the stream-stream interval join fed TIME-ALIGNED
  *    chunks on both sides (so the 2 h watermark never evicts a click
  *    while its purchase is still in flight — the deployment invariant),
  *    vs the bin-bucketed batch `TimeJoin.intervalJoin`.
  *  - ingest: `dedupIngest` over two document batches vs batch
  *    `incrementalCandidates` of batch 2 against batch 1's band index.
  *
  * Run: SPARK_GRAFT_SF_DIR=testdata-sf1 SPARK_GRAFT_CPUS=32 \
  *        SPARK_DRIVER_MEM=24g sbt "runMain graft.StreamEq"
  */
object StreamEq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft_streameq").toString
    val results = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Boolean)]()

    /** Both-direction except over name-aligned columns. */
    def record(name: String, stream: DataFrame, batch: DataFrame): Unit = {
      val cols = batch.columns.sorted.map(col).toSeq
      val s = stream.select(cols: _*)
      val b = batch.select(cols: _*)
      val (sn, bn) = (s.count(), b.count())
      val ok = sn == bn && s.except(b).isEmpty && b.except(s).isEmpty
      results(name) = (sn, bn, ok)
      println(s"[streameq] $name: stream=$sn batch=$bn identical=$ok")
    }

    val eventsDf = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")

    // ---- windows_file_stream --------------------------------------------
    locally {
      val q = Streams.hourlyWindows(
          Streams.eventsFileStream(spark, sfDir, maxFilesPerTrigger = 4))
        .writeStream.format("memory").queryName("streameq_win")
        .outputMode(OutputMode.Complete)
        .option("checkpointLocation", s"$tmp/ckpt_win").start()
      try q.processAllAvailable() finally q.stop()
      record("windows_file_stream", spark.table("streameq_win"),
        Events.tumbling(eventsDf))
    }

    // ---- cdc_complete ---------------------------------------------------
    locally {
      val src = MemoryStream[Event](spark)
      val q = Events.cdcApply(src.toDF())
        .writeStream.format("memory").queryName("streameq_cdc")
        .outputMode(OutputMode.Complete)
        .option("checkpointLocation", s"$tmp/ckpt_cdc").start()
      val chunks = eventsDf.as[Event].collect().grouped(300000).toSeq
      try {
        chunks.foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      } finally q.stop()
      record("cdc_complete", spark.table("streameq_cdc"), Events.cdcApply(eventsDf))
    }

    // shared ordered-chunk material for the stateful Append-mode checks
    val ordered = eventsDf.orderBy("ts", "event_id").as[Event].collect()
    val maxTsMs = ordered.last.ts.getTime
    def sentinel(offsetH: Int) = Event(-1L - offsetH,
      new java.sql.Timestamp(maxTsMs + (240L + offsetH) * 3600 * 1000), -1L, "signup", 0.0)
    /** Two far-future batches: the first advances the watermark past all
      * real event time (+2 h delay), the second triggers the timeout
      * batch that finalizes state sealed by the first. */
    def flush(src: MemoryStream[Event], q: StreamingQuery): Unit = {
      src.addData(sentinel(0)); q.processAllAvailable()
      src.addData(sentinel(1)); q.processAllAvailable()
    }

    // ---- sessions -------------------------------------------------------
    locally {
      val src = MemoryStream[Event](spark)
      val q = Streams.sessionize(src.toDS())
        .writeStream.format("memory").queryName("streameq_sess")
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$tmp/ckpt_sess").start()
      try {
        ordered.grouped(300000).foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
        flush(src, q)
      } finally q.stop()
      // EXACT compare, including sum_value: the stream accumulates the
      // same 1e-4-unit decimals the batch's dec() cast sums
      record("sessions",
        spark.table("streameq_sess").filter(col("user_id") >= 0)
          .select("user_id", "session_start", "session_end", "n_events", "sum_value"),
        Events.sessions(eventsDf)
          .select("user_id", "session_start", "session_end", "n_events", "sum_value"))
    }

    // ---- funnel (unsorted delivery) ------------------------------------
    locally {
      val src = MemoryStream[Event](spark)
      val q = Streams.funnelStages(src.toDS())
        .writeStream.format("memory").queryName("streameq_funnel")
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$tmp/ckpt_funnel").start()
      // out-of-order WITHIN the watermark contract: time-ordered chunks
      // (so nothing arrives >2 h late and gets watermark-dropped), each
      // chunk internally shuffled — a multi-day horizon of reordering
      // per micro-batch, which the buffered state machine must absorb
      val rnd = new scala.util.Random(42)
      try {
        ordered.grouped(300000).foreach { c =>
          src.addData(rnd.shuffle(c.toSeq)); q.processAllAvailable()
        }
        flush(src, q)
      } finally q.stop()
      val pivoted = spark.table("streameq_funnel").filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(min(when(col("stage") === 1, unix_micros(col("ts")))).as("t1"),
          min(when(col("stage") === 2, unix_micros(col("ts")))).as("t2"),
          min(when(col("stage") === 3, unix_micros(col("ts")))).as("t3"))
      // batch rows whose user never hit stage 1 have no streaming rows
      record("funnel", pivoted,
        Events.funnelUsers(eventsDf).filter(col("t1").isNotNull))
    }

    // ---- dedup ----------------------------------------------------------
    locally {
      val src = MemoryStream[Event](spark)
      val q = Streams.dedupEvents(src.toDF())
        .writeStream.format("parquet")
        .option("path", s"$tmp/dedup_out")
        .option("checkpointLocation", s"$tmp/ckpt_dedup")
        .outputMode(OutputMode.Append).start()
      try {
        ordered.grouped(300000).foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
        src.addData(ordered.filter(_.event_id % 10 == 0).toSeq) // re-delivery
        q.processAllAvailable()
      } finally q.stop()
      record("dedup", spark.read.parquet(s"$tmp/dedup_out"), eventsDf.distinct())
    }

    // ---- upsert ---------------------------------------------------------
    locally {
      val src = MemoryStream[Event](spark)
      val ord = struct(col("ts"), col("event_id")).desc
      val q = Streams.upsertStream(src.toDF(), Seq("user_id"), ord,
        s"$tmp/upsert_table", s"$tmp/ckpt_upsert")
      try {
        ordered.grouped(300000).foreach { c => src.addData(c.toSeq); q.processAllAvailable() }
      } finally q.stop()
      record("upsert", spark.read.parquet(s"$tmp/upsert_table"),
        graft.operators.Merge.keepFirst(eventsDf, Seq("user_id"), ord))
    }

    // ---- attribution ----------------------------------------------------
    locally {
      val clicks = MemoryStream[Event](spark)
      val purchases = MemoryStream[Event](spark)
      val q = Streams.clickAttribution(clicks.toDF(), purchases.toDF())
        .writeStream.format("memory").queryName("streameq_attr")
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$tmp/ckpt_attr").start()
      try {
        // time-aligned chunks on BOTH sides: the watermark trails the
        // newest chunk by 2 h, so no click is evicted while a purchase
        // within its 30 min window is still unseen
        ordered.grouped(300000).foreach { c =>
          clicks.addData(c.filter(_.event_type == "click").toSeq)
          purchases.addData(c.filter(_.event_type == "purchase").toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      val win = Streams.AttributionWindowMin * 60L * 1000000L
      val pur = eventsDf.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
      val clk = eventsDf.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val batchPairs = TimeJoin.intervalJoin(pur, clk, Seq("user_id"),
        startUs = unix_micros(col("purchase_ts")) - win,
        endUs = unix_micros(col("purchase_ts")) + 1L,
        tUs = unix_micros(col("click_ts")),
        binUs = win).select("purchase_id", "click_id")
      record("attribution",
        spark.table("streameq_attr").select("purchase_id", "click_id"), batchPairs)
    }

    // ---- ingest ---------------------------------------------------------
    locally {
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "text").as[(Long, String)].collect()
      val (b1, b2) = docs.splitAt(docs.length / 2)
      val src = MemoryStream[(Long, String)](spark)
      val q = Streams.dedupIngest(src.toDF().toDF("doc_id", "text"),
        s"$tmp/ingest_index", s"$tmp/ingest_hits", s"$tmp/ckpt_ingest")
      try {
        src.addData(b1.toSeq); q.processAllAvailable()
        src.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      val bands1 = graft.operators.Dedup.bandIndex(b1.toSeq.toDF("doc_id", "text"))
      val bands2 = graft.operators.Dedup.bandIndex(b2.toSeq.toDF("doc_id", "text"))
      record("ingest",
        spark.read.parquet(s"$tmp/ingest_hits").filter(col("batch_id") === 1)
          .select("doc_new", "doc_idx"),
        graft.operators.Dedup.incrementalCandidates(bands2, bands1)
          .select("doc_new", "doc_idx"))
    }

    val checks = results.map { case (n, (s, b, ok)) =>
      s""""$n":{"stream_rows":$s,"batch_rows":$b,"identical":$ok}"""
    }.mkString("{", ",", "}")
    val all = results.values.forall(_._3)
    val json = s"""{"experiment":"stream_batch_equivalence","sf":"$sfDir","checks":$checks,"all_identical":$all}"""
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAMEQ_OUT", "streameq.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    if (!all) sys.exit(1)
  }
}
