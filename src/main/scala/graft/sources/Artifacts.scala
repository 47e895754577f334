package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist-and-reuse for TRAINED artifacts (the k-means ANN codebook,
  * the bigram-LM model table): train once, write parquet, and let every
  * later query read the table instead of re-running the training pass —
  * the same persist-then-reuse discipline the LSH band index already
  * follows ([[Sinks.compactBandIndex]], `Dedup.qIncremental`).
  *
  * Freshness contract: the artifact path embeds a FINGERPRINT of the
  * training source (total length + max modification time, recursively
  * for directories). Retraining therefore happens exactly when the
  * source data changes — a stale model can never score fresh data, and
  * repeated queries over unchanged data never retrain. This is the
  * poor-man's content-addressing that a table format's snapshot id
  * would provide natively; at 100 TB the fingerprint swaps for the
  * Delta/Iceberg snapshot id with no change to the call shape.
  *
  * Concurrency: two racing trainers of the same (kind, source,
  * fingerprint) train identical content (training is deterministic —
  * exact integer arithmetic throughout), but they must NOT write the
  * same path: two Spark jobs writing one directory share its
  * `_temporary` staging dir, and either job's commit/cleanup deletes
  * the other's in-flight task files (ArtifactsSpec's race test caught
  * exactly that — the naive same-path overwrite is not benign).
  * [[cached]] therefore stages each writer's output in its own
  * UNIQUE temp directory, then publishes via an atomic claim-file
  * create (`overwrite = false` — atomic on HDFS and close enough on
  * the local fs) followed by a rename of the winner's staging dir
  * onto the final path; losers delete their staging dir (content was
  * identical) and wait for the winner's rename. Old fingerprints
  * accumulate as superseded directories; [[sweep]] is the retention
  * janitor.
  */
object Artifacts {
  /** Artifact store root — env-overridable so the bench/driver can
    * isolate runs; default is repo-local (gitignored). */
  def root: String = sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS", ".artifacts")

  /** (host, pid) discriminator for process-scoped paths/table names —
    * pid alone is unique only per host, and a shared artifact root can
    * serve drivers on several machines (the Dedup.compactedBandTable
    * discipline, centralized here in r16 so the publish root can use
    * it). Sanitized to the catalog's identifier alphabet; hostname
    * truncated but kept human-readable for leftover triage. */
  lazy val procTag: String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
               catch { case _: Throwable => "unknownhost" }
    val h = host.replaceAll("[^A-Za-z0-9]", "_").take(24).toLowerCase
    s"h${h}_p${ProcessHandle.current().pid()}"
  }

  /** True iff `name` carries THIS host's procTag suffix for a pid that
    * is no longer alive — the provably-dead-leftover test used by the
    * per-process janitors (band table, publish root). Names from OTHER
    * hosts are never claimed dead: their liveness is unknowable here. */
  def isDeadProcessLeftover(name: String): Boolean = {
    val hostPart = procTag.substring(0, procTag.lastIndexOf("_p") + 2)
    name.contains(hostPart) && {
      val pidStr = name.substring(name.lastIndexOf("_p") + 2).takeWhile(_.isDigit)
      pidStr.nonEmpty && pidStr.toLongOption.exists { pid =>
        pid != ProcessHandle.current().pid() &&
          !ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
      }
    }
  }

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def tag(src: String): String =
    src.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+", "")

  /** Source fingerprint: total bytes + newest mtime under `src`. */
  private def fingerprint(s: SparkSession, src: String): String = {
    val p = new Path(src)
    val f = fs(s, p)
    val st = f.getFileStatus(p)
    if (st.isFile) s"${st.getLen}_${st.getModificationTime}"
    else {
      val it = f.listFiles(p, true)
      var len = 0L; var mt = 0L
      while (it.hasNext) {
        val e = it.next(); len += e.getLen; mt = math.max(mt, e.getModificationTime)
      }
      s"${len}_$mt"
    }
  }

  /** Resolved artifact path for (kind, training source) at the source's
    * CURRENT fingerprint. */
  def path(s: SparkSession, kind: String, src: String): String =
    s"$root/$kind/${tag(src)}_${fingerprint(s, src)}"

  /** Read-or-train: return the persisted artifact for (kind, src),
    * training and writing it first iff the source's current fingerprint
    * has no artifact yet. The returned frame always reads FROM PARQUET —
    * the caller's plan carries a scan, not the training subtree. */
  def cached(s: SparkSession, kind: String, src: String)(train: => DataFrame): DataFrame =
    cachedWith(s, kind, src, Nil)(train)

  /** [[cached]] with a Hive-style `partitionBy` layout — for artifacts
    * whose VALUE is the directory structure itself (e.g. the
    * month-partitioned fact copy that dynamic partition pruning prunes
    * at runtime). Same fingerprint/claim/rename lifecycle. */
  def cachedPartitioned(s: SparkSession, kind: String, src: String,
      parts: Seq[String])(train: => DataFrame): DataFrame =
    cachedWith(s, kind, src, parts)(train)

  /** Declared-layout sidecar (`_parts.json`): the partition columns an
    * artifact was DECLARED with, persisted at write time. The refresh
    * guard validates against this rather than inferring layout from
    * `col=` directories, which a zero-row partitioned write never
    * produces — without the sidecar, an empty partitioned artifact
    * could be refreshed under a different layout, exactly the swap the
    * guard exists to refuse (ADVICE r14). Underscore prefix keeps it
    * invisible to parquet readers. */
  private def writeParts(s: SparkSession, dir: Path, parts: Seq[String]): Unit = {
    val out = fs(s, dir).create(new Path(dir, "_parts.json"), true)
    out.write(parts.map("\"" + _ + "\"").mkString("[", ",", "]").getBytes("UTF-8"))
    out.close()
  }

  private def readParts(s: SparkSession, dir: Path): Option[Seq[String]] = {
    val sp = new Path(dir, "_parts.json")
    val f = fs(s, dir)
    if (!f.exists(sp)) None
    else {
      val in = f.open(sp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      Some(txt.trim.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
    }
  }

  private def cachedWith(s: SparkSession, kind: String, src: String,
      parts: Seq[String])(train: => DataFrame): DataFrame = {
    val p = path(s, kind, src)
    val hp = new Path(p)
    val f = fs(s, hp)
    if (!f.exists(hp)) {
      // Stage in a writer-unique dir: concurrent Spark jobs must never
      // share one output path's _temporary staging (see scaladoc).
      val tmp = new Path(p + s".train-${java.util.UUID.randomUUID}")
      train.write.mode("overwrite").partitionBy(parts: _*).parquet(tmp.toString)
      // sidecar rides inside the staging dir so the atomic rename
      // publishes data + declared layout together
      writeParts(s, tmp, parts)
      val claimed =
        try { f.create(new Path(p + ".claim"), false).close(); true }
        catch { case _: java.io.IOException => false } // racer claimed first
      if (claimed) {
        if (!f.rename(tmp, hp)) {
          f.delete(tmp, true)
          require(f.exists(hp), s"artifact publish failed for $p")
        }
        // claim served its purpose once the artifact is visible: every
        // later writer short-circuits on the exists(hp) check
        f.delete(new Path(p + ".claim"), false)
      } else {
        // Lost the publish race: our content is identical by determinism —
        // discard it and wait out the winner's (post-training) rename.
        f.delete(tmp, true)
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (!f.exists(hp) && System.nanoTime() < deadline) Thread.sleep(50)
        require(f.exists(hp), s"artifact claim exists but $p never appeared")
      }
    }
    s.read.parquet(p)
  }

  /** Force retrain at the current fingerprint (e.g. after a logic
    * change with unchanged data). `parts` must mirror the layout the
    * artifact was declared with ([[cachedPartitioned]]): refreshing a
    * partitioned artifact under a different partitionBy would silently
    * swap the directory layout that runtime pruning (DPP) depends on —
    * ADVICE r12/r13. The mismatch guard is structural AND symmetric:
    * the existing artifact's partition columns are derived from its
    * Hive-style `col=` directory chain and must equal `parts` exactly
    * (order included — nesting order IS the layout); a flat refresh of
    * a partitioned artifact, a partitioned refresh of a flat one, and
    * a reordered/renamed layout are all refused at the call site. */
  def refresh(s: SparkSession, kind: String, src: String,
              parts: Seq[String] = Nil)(train: => DataFrame): DataFrame = {
    val p = path(s, kind, src)
    val hp = new Path(p)
    val f = fs(s, hp)
    if (f.exists(hp)) {
      readParts(s, hp) match {
        // the sidecar IS the declared layout — authoritative even for a
        // zero-row artifact, whose directory shape is indeterminate (no
        // `col=` dirs, no data files); the ADVICE-r14 hole where an
        // empty partitioned artifact accepted a layout-swapping refresh
        // is closed by validating against the declaration, not the disk
        case Some(declared) =>
          require(declared == parts,
            s"refresh of $kind with parts=[${parts.mkString(",")}] would " +
              s"change the declared layout [${declared.mkString(",")}] at $p " +
              "— pass exactly the parts the artifact was declared with")
        case None =>
          // pre-sidecar artifact: fall back to inferring the layout from
          // the first Hive-style `col=value` directory chain, with the
          // zero-row carve-out (an empty write publishes neither `col=`
          // dirs nor data files, so its shape proves nothing)
          def partChain(dir: Path): Seq[String] =
            f.listStatus(dir).find(st =>
              st.isDirectory && st.getPath.getName.contains("=")) match {
              case Some(st) =>
                st.getPath.getName.split("=", 2)(0) +: partChain(st.getPath)
              case None => Nil
            }
          val existing = partChain(hp)
          val hasData = f.listFiles(hp, true)
          var empty = true
          while (empty && hasData.hasNext)
            if (hasData.next().getPath.getName.endsWith(".parquet")) empty = false
          require(existing == parts || (existing.isEmpty && empty),
            s"refresh of $kind with parts=[${parts.mkString(",")}] would " +
              s"change the existing layout [${existing.mkString(",")}] at $p " +
              "— pass exactly the parts the artifact was declared with")
      }
    }
    train.write.mode("overwrite").partitionBy(parts: _*).parquet(p)
    writeParts(s, hp, parts)
    s.read.parquet(p)
  }

  /** Retention janitor: drop every artifact of `kind` for this source
    * EXCEPT the current fingerprint's — the compaction step of the
    * persist-and-reuse lifecycle (mirrors the band-index compaction's
    * fold-small-partitions role). */
  def sweep(s: SparkSession, kind: String, src: String): Unit = {
    val dir = new Path(s"$root/$kind")
    val f = fs(s, dir)
    if (f.exists(dir)) {
      val keep = new Path(path(s, kind, src)).getName
      val prefix = tag(src) + "_"
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n != keep) f.delete(st.getPath, true)
      }
    }
  }
}
