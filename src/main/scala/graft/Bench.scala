package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Two honesty fixes over round 1 (VERDICT §perf):
  *
  *   - Action is a `noop`-format write, not `.count()`: `count()` lets
  *     Catalyst prune every column and collapse the plan to a row count,
  *     under-measuring scan/join work. The noop sink materializes every
  *     output row/column through the full physical plan without disk I/O.
  *   - A warmup pass at sf0.001 runs each plan shape once first, so JIT +
  *     whole-stage-codegen compilation is not billed to the first query
  *     (round 1 charged ~7s of warmup to `kpi_delta_company`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    // All gate knobs (master / executor classpath+memory / AQE /
    // checkpoint / log level) come from the shared session fold — see
    // GraftSession. ERROR default: the one recurring WARN is WindowExec's
    // single-partition note for the dim surrogate-key window, by-design
    // for dim-sized inputs (Etl.dimDept doc) — at WARN it floods the
    // bench JSON's tail.
    val spark = GraftSession.build(defaultCpus = "4")
    val master = spark.sparkContext.master

    def run(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Release leftover storage between queries: the iterative operators
    // (connected components, Lloyd training, upsert sinks) use eager
    // localCheckpoint, whose blocks have no public release API and so
    // pile up in the BlockManager across a 46-query session. Round-3's
    // bench measured dedup_simhash at 18.6 s mid-run vs 1.65 s isolated —
    // pure storage-vs-execution memory contention, not plan cost. Every
    // rep rebuilds its own checkpoints (fn is re-invoked), so sweeping
    // after the action is safe.
    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // Single-JVM bench hygiene: ~100 sequential heavy queries fragment
      // the old gen, and by late session queries measure GC, not plans —
      // at sf10 the inflation reached 10× (59 s in-session vs 4.9 s
      // isolated for text_langid). An explicit collection between
      // queries runs OUTSIDE the timed window and keeps each query's
      // min-of-reps measuring its own plan. But an UNCONDITIONAL
      // System.gc() is a full collection that also unloads cold JIT'd
      // codegen classes — measured as a uniform ~0.1-0.3 s re-JIT tax
      // per query at sf0.1 (62 s → 76 s session total) where the heap
      // was never pressured. Collect only when the heap is actually
      // past half its ceiling: a no-op at small sf, the tail-rescuer at
      // sf10. Multi-executor clusters don't share one old gen across a
      // whole suite — this is harness fidelity, not an engine lever.
      val rt = Runtime.getRuntime
      val pressured = rt.totalMemory - rt.freeMemory > rt.maxMemory / 2
      // Multi-process masters additionally need the driver GC to run the
      // ContextCleaner — executor-side broadcast blocks are only dropped
      // when the DRIVER collects their references, and executor memory
      // pressure is invisible to the driver-heap condition above — and
      // they need the cleanup to COMPLETE before the next rep starts:
      // the cleaner is asynchronous, and racing it leaves dead
      // HashedRelations pinning the storage pool (the r11 finding — the
      // 4 heaviest queries died with FailedToGrowBytesToBytesMap at
      // sf1/local-cluster[4,8,8192], green once the sweep waits; see
      // ExecutorDrain). These conditions are INDEPENDENT: the drain must
      // run on every multi-process sweep, driver heap pressured or not —
      // the pressured iterations are exactly the ones with broadcast
      // cleanup queued (awaitClean gc's itself, subsuming the pressure
      // collection on that path). local[*] keeps the conditional policy:
      // there the blocks share this JVM's heap, so the condition sees
      // them, and the unconditional-gc re-JIT tax stays out of the
      // recorded numbers.
      if (!master.startsWith("local[")) ExecutorDrain.awaitClean(spark)
      else if (pressured) System.gc()
    }

    // Optional comma-separated name filter for local iteration on one
    // query's timing (full runs leave it unset — the driver's JSON must
    // cover every declared query).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // A typo'd name would silently bench nothing — fail fast and list the
    // valid names instead of emitting an empty-looking JSON.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not declared in SparkEntry.queries: " +
          s"${unknown.mkString(", ")}; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      System.err.println(s"bench: restricted to ${names.toSeq.sorted.mkString(", ")}")
    }
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }

    // Compact-line abbreviation uniqueness is checked BEFORE any query
    // runs (ADVICE r15): the abbreviation depends only on names, and the
    // old post-run require threw away a completed (expensive) bench run's
    // durable artifact over a collision that was knowable at startup.
    val famCode = Map(
      "events" -> "ev", "dedup" -> "dd", "etl" -> "et", "text" -> "tx",
      "join" -> "jn", "catalog" -> "ct", "media" -> "md",
      "pipeline" -> "pp", "kpi" -> "kp", "similar" -> "sm",
      "layout" -> "ly", "sample" -> "sa")
    def abbr(name: String): String = {
      val i = name.indexOf('_')
      val (p, rest) = if (i > 0) (name.substring(0, i), name.substring(i + 1)) else (name, name)
      def short(w: String) = w.take(4) + w.drop(4).filter(_.isDigit)
      famCode.getOrElse(p, p) + rest.split('_').map(short).mkString
    }
    locally {
      val abbrs = selected.keys.map(n => abbr(n) -> n).toSeq
      require(abbrs.map(_._1).distinct.size == abbrs.size,
        s"bench abbr collision: ${abbrs.groupBy(_._1).filter(_._2.size > 1)}")
    }

    // Warmup: same plan shapes, tiny data — compiles codegen + JITs hot paths.
    selected.foreach { case (_, fn) =>
      try run(fn(spark, warmDir)) catch { case _: Throwable => () }
      sweep()
    }
    // Warm the target-dir file index + footers too: listing and schema
    // reads are one-time session costs that would otherwise be billed to
    // whichever query happens to run first at sfDir.
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => try spark.read.parquet(f.getPath).limit(1).count()
        catch { case _: Throwable => () })

    // Epoch canary (VERDICT r12 #6): one fixed, DATA-INDEPENDENT plan —
    // a 32-task range scan + codegen'd sum, no files, no shuffle — timed
    // min-of-5 after warmup. Its cost is pure machine epoch (JVM/job
    // launch + dispatch + codegen'd loop), the same fixed overhead that
    // moved every small query ×1.18 between the r10 and r11 driver
    // epochs (BENCHDRIFT_r12.json). Cross-round >2× reads divide by the
    // canary ratio FIRST: if epoch_ms moved with the fleet, the per-
    // query drift is machine, not plan. Runs once per bench, recorded
    // as `epoch_ms` in both JSON lines.
    val epochMs: Long = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0, 64L * 1000 * 1000, 1, 32)
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("id")))
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e6
      }
      once() // canary warmup: its own codegen compile is not the epoch
      math.round((1 to 5).map(_ => once()).min)
    }

    // Shuffle canary (VERDICT r15 #8): the CPU canary above cannot see
    // shuffle/IO epoch drift — BASELINE.md §r14 records exactly that
    // blind spot, and it is where cross-round drift adjudications keep
    // landing. This probe is the same fixed data-independent discipline
    // but dominated by the shuffle machinery: 8M rows hashed on a 2M-key
    // column (high cardinality so partial aggregation cannot collapse the
    // map side) — ~128 MB through shuffle write, spill-file create, fetch
    // and the hash aggregate's memory manager. Recorded as `shuffle_ms` /
    // compact `sh`; drift adjudications divide shuffle-heavy queries by
    // THIS canary's ratio and CPU-bound ones by `epoch_ms`'s.
    val shuffleMs: Long = {
      import org.apache.spark.sql.functions.{col, pmod, sum => fsum}
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0, 8L * 1000 * 1000, 1, 32)
          .select(pmod(col("id"), org.apache.spark.sql.functions.lit(2L * 1000 * 1000)).as("k"), col("id"))
          .groupBy("k").agg(fsum(col("id")))
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e6
      }
      once() // its own codegen/JIT compile is not the probe
      math.round((1 to 5).map(_ => once()).min)
    }

    // min over reps: single-JVM local mode has multi-second GC/JIT noise
    // (observed 2.8 s vs 8.1 s for the same query across back-to-back
    // runs); the minimum is the standard low-noise estimator of
    // intrinsic plan cost. Reps overridable for quick local iteration.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // failures surface in the JSON, not as silently-fast timings: a
    // query that throws is EXCLUDED from `queries`/`total` (its ~0 s
    // planning-failure timing would otherwise shrink the headline total
    // and read as a speedup) and listed in `errors` instead
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    val results = selected.flatMap { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try run(fn(spark, sfDir)) catch { case _: Throwable => errors += name }
        val dt = (System.nanoTime() - t0) / 1e9
        sweep()
        dt
      }
      if (errors.contains(name)) None else Some(name -> times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","epoch_ms":$epochMs,"shuffle_ms":$shuffleMs,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // Second, compact line — printed LAST so it is the line the driver's
    // bounded stdout capture parses. The window keeps only the final
    // ~2000 chars and sbt's own "[success] Total time ..." line eats
    // ~75 of them, so the line must stay under ~1900 chars even as the
    // surface grows. The r13/r14 family-grouped ms line measured 2078
    // chars at 118 queries and both rounds recorded parsed:false (the
    // window opened mid-object). This encoding measures 1651 chars at
    // 118 queries (~1840 at 132):
    //   - names: 2-letter family code + each '_'-word of the rest
    //     truncated to 4 chars (trailing digits the cut would drop are
    //     kept: fuzzy2 -> fuzz2, zorder3 -> zord3), words concatenated.
    //     kpi_headcount_approx -> "kpheadappr". Decode rule also in
    //     BASELINE.md; bench_full.json keeps the full-name full-precision
    //     map. Uniqueness is ASSERTED at startup (before any query runs —
    //     ADVICE r15) so a colliding future name fails the bench loudly
    //     without first burning a full timed suite.
    //   - values: centiseconds (10 ms resolution — the epoch canary
    //     itself wanders ~70 ms, so nothing real lives below this).
    val gq = results.map { case (n, sec) =>
      "\"" + abbr(n) + "\":" + math.max(1, math.round(sec * 100))
    }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${math.round(total * 100) / 100.0},"unit":"sec","n":${results.size},"ep":$epochMs,"sh":$shuffleMs,"cs":$gq,"errors":$errs,"sf":"${new java.io.File(sfDir).getName}"}"""
    println(compact)
    if (compact.length > 1850)
      System.err.println(s"bench: WARNING compact line ${compact.length} chars — approaching the ~1900-char driver capture bound; tighten the encoding")
    // Also persist the full JSON to a file: the driver captures stdout
    // through a bounded tail window that has truncated mid-object (round
    // 7 kept 66 of 101 per-query timings), leaving the recorded total
    // unreproducible from the artifact. The file is the durable copy —
    // every per-query timing survives regardless of log capture.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: $e") }
    spark.stop()
  }
}
