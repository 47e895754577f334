package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer MULTI-TABLE atomic publish — the one documented
  * transactionality gap vs the reference (SURVEY §7.3): the reference
  * wraps its 3-table load in a single transaction
  * (`reference/scripts/load_once.py:24` `engine.begin()`), while
  * per-table Parquet overwrites expose a window where a reader sees new
  * facts next to old dims. The generation-pointer scheme closes it:
  *
  * ```
  * root/
  *   generations/gen-000007-<uuid>/   # all tables + _MANIFEST.json
  *   CURRENT                          # one small file naming the live gen
  * ```
  *
  * Writers stage EVERY table of a generation under a fresh uniquely-named
  * directory (never touched by readers — CURRENT does not name it yet),
  * then swap the CURRENT pointer file in one atomic rename. Readers
  * resolve CURRENT once and read all tables from that generation — they
  * see the complete old set or the complete new set, never a mix. The
  * crash window is benign by construction: a writer dying anywhere
  * before the swap leaves CURRENT untouched (readers keep the old
  * generation; the orphaned staging dir is swept later), and the swap
  * itself is a single filesystem rename.
  *
  * Durability scope: TWO commit protocols behind the same API (r16,
  * VERDICT #4 — the r15 caveat closed).
  *
  *   - `pointer` — CURRENT pointer file swapped by atomic
  *     rename-with-overwrite. Correct on HDFS and local filesystems,
  *     where rename is atomic; the default for their schemes.
  *   - `log` — a rename-FREE commit log for object stores, where
  *     rename is copy+delete and the pointer swap would expose a
  *     missing/partial-pointer window. Commits are immutable files
  *     `_log/c-<slot>.commit` (content = generation name) created with
  *     create-if-absent — the one primitive object stores offer
  *     atomically (S3 conditional PUT `If-None-Match:*`, GCS
  *     `ifGenerationMatch=0`, ABFS ETag preconditions). The live
  *     generation is the highest-slot READABLE commit: a crashed PUT
  *     (no object on a real store; an empty file on a simulated one)
  *     is skipped, so readers only ever see complete commits. Slot
  *     exclusivity is the CAS: a writer losing the create race
  *     re-lists and retries the next slot, preserving last-wins.
  *
  * Protocol per root: `spark.graft.publish.protocol` (`pointer`|`log`)
  * when set; else an existing `_log` directory (a log root stays a log
  * root); else by scheme — file/hdfs/viewfs get `pointer`, anything
  * else (s3a/gs/abfs/…) gets `log`. Data files are staged through the
  * normal writer either way; on object stores that path pairs with a
  * store-native committer (magic/EMRFS) — the protocol here is about
  * what makes a staged generation LIVE, and in `log` mode that path
  * performs no rename at all (PublishSpec drives it against a
  * filesystem whose rename throws).
  *
  * Single-writer assumption, like the reference's one ETL loader:
  * concurrent publishers do not corrupt (staging dirs are unique,
  * pointer swap is last-wins) but the loser's generation is silently
  * superseded. Retention keeps the live generation plus its
  * predecessor, so readers that resolved CURRENT just before a swap
  * finish their scan against intact files.
  */
object Publish {

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def genDir(root: String, gen: String) =
    new Path(s"$root/generations/$gen")

  private def readPointer(s: SparkSession, p: Path): Option[String] = {
    val f = fs(s, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
      if (txt.isEmpty) None else Some(txt)
    }
  }

  // ---- protocol selection -------------------------------------------

  /** Schemes with ATOMIC rename-with-overwrite — the pointer protocol's
    * correctness precondition. Everything else defaults to the log. */
  private val RenameSafeSchemes = Set("file", "hdfs", "viewfs")

  private def logDir(root: String) = new Path(s"$root/_log")

  /** Resolve the commit protocol for a root: explicit conf first, then
    * root state (an existing log keeps the root on the log protocol so
    * a conf unset can't strand readers), then scheme default. */
  def protocolFor(s: SparkSession, root: String): String =
    s.conf.getOption("spark.graft.publish.protocol").getOrElse {
      val p = new Path(root)
      val scheme = Option(fs(s, p).makeQualified(p).toUri.getScheme).getOrElse("file")
      if (fs(s, logDir(root)).exists(logDir(root))) "log"
      else if (RenameSafeSchemes(scheme)) "pointer"
      else "log"
    }

  // ---- the rename-free commit log (object-store protocol) -----------

  private val CommitRe = "^c-(\\d{8})\\.commit$".r

  /** All commits, highest slot first, SKIPPING unreadable/empty entries:
    * on a real object store an interrupted conditional PUT leaves no
    * object; the simulated-store twin (an empty or torn local file) must
    * read the same way — as not-yet-committed. */
  private def readCommits(s: SparkSession, root: String): Seq[(Int, String)] = {
    val dir = logDir(root)
    val f = fs(s, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName match {
        case CommitRe(n) => Some((n.toInt, st.getPath))
        case _ => None
      })
      .sortBy(-_._1)
      .flatMap { case (slot, p) =>
        val txt = try {
          val in = f.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } catch { case _: java.io.IOException => "" }
        if (txt.isEmpty) None else Some((slot, txt))
      }
  }

  /** Append a commit naming `gen`: create-if-absent on the next slot —
    * the conditional-put CAS. Losing the race (slot already taken)
    * re-lists and retries the NEXT slot, so concurrent publishers
    * serialize and the last slot wins, same semantics as the pointer
    * overwrite. No rename anywhere on this path. */
  private def commitToLog(s: SparkSession, root: String, gen: String): Unit = {
    val dir = logDir(root)
    val f = fs(s, dir)
    if (!f.exists(dir)) f.mkdirs(dir)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      require(attempts <= 16,
        s"lost the commit-slot race 16 times under $root — a live writer storm")
      val slot = readCommitSlotMax(s, root) + 1
      val p = new Path(dir, f"c-$slot%08d.commit")
      try {
        val out = f.create(p, false) // create-if-absent: the CAS
        out.write(gen.getBytes("UTF-8")); out.close()
        done = true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => // retry next slot
        case _: java.io.IOException if f.exists(p) => // local FS maps the collision to plain IOE
      }
    }
  }

  /** Highest slot NUMBER present, readable or not — a torn commit still
    * owns its slot (its creator holds the name), so writers must skip
    * past it rather than collide forever. */
  private def readCommitSlotMax(s: SparkSession, root: String): Int = {
    val dir = logDir(root)
    val f = fs(s, dir)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).flatMap(st => st.getPath.getName match {
      case CommitRe(n) => Some(n.toInt)
      case _ => None
    }).foldLeft(0)(math.max)
  }

  // ---- the read side, protocol-dispatched ----------------------------

  /** The live generation name, if any generation was ever published.
    * Log roots answer from the highest readable commit; pointer roots
    * from CURRENT. A root carrying BOTH (mid-migration) prefers the log
    * — the log only exists because a publish wrote it after the last
    * pointer swap. */
  def currentGen(s: SparkSession, root: String): Option[String] =
    readCommits(s, root).headOption.map(_._2)
      .orElse(readPointer(s, new Path(s"$root/CURRENT")))

  /** The generation the previous commit named — what retention protects
    * for in-flight readers of the old pointer. Log roots answer from the
    * second-highest readable commit; pointer roots from PREVIOUS
    * (written by [[swapPointer]] just before each swap). Inferring the
    * predecessor from directory order instead is wrong: a staged-but-
    * never-swapped orphan (writer crash between stage and swap) sorts
    * newer than the real predecessor and would get kept in its place
    * while the real one is deleted under live readers (ADVICE r15). */
  def previousGen(s: SparkSession, root: String): Option[String] = {
    val commits = readCommits(s, root)
    if (commits.nonEmpty)
      // mid-migration (one log commit over a legacy pointer root): the
      // generation the pointer still names was live until that commit —
      // it IS the predecessor in-flight pointer-readers hold
      commits.lift(1).map(_._2)
        .orElse(readPointer(s, new Path(s"$root/CURRENT")))
    else readPointer(s, new Path(s"$root/PREVIOUS"))
  }

  /** Stage a complete generation (all tables + manifest) WITHOUT making
    * it live — the crash-window half that EtlPublishSpec kills between.
    * Returns the staged generation name. */
  def stageGeneration(s: SparkSession, root: String,
                      tables: Seq[(String, DataFrame)]): String = {
    require(tables.nonEmpty, "a generation must carry at least one table")
    val n = currentGen(s, root)
      .flatMap(_.split("-").lift(1)).flatMap(_.toIntOption).getOrElse(0) + 1
    val gen = f"gen-$n%06d-${java.util.UUID.randomUUID.toString.take(8)}"
    val dir = genDir(root, gen)
    // mode "error": the uuid makes the dir fresh by construction; a
    // collision is a bug worth dying on, not overwriting through
    tables.foreach { case (name, df) =>
      df.write.mode("error").parquet(new Path(dir, name).toString)
    }
    val manifest = tables.map(t => "\"" + t._1 + "\"")
      .mkString(s"""{"generation":"$gen","tables":[""", ",", "]}")
    val out = fs(s, dir).create(new Path(dir, "_MANIFEST.json"), false)
    out.write(manifest.getBytes("UTF-8")); out.close()
    gen
  }

  /** Make a staged generation live, by the root's protocol. Pointer
    * roots write the pointer beside CURRENT then atomically rename over
    * it ([[FileContext]] supports rename-with-overwrite; plain
    * `FileSystem.rename` refuses an existing destination, and
    * delete-then-rename would open exactly the no-pointer window this
    * module exists to close). Log roots append one create-if-absent
    * commit — no rename on the path at all. */
  def swapPointer(s: SparkSession, root: String, gen: String): Unit = {
    require(fs(s, genDir(root, gen)).exists(new Path(genDir(root, gen), "_MANIFEST.json")),
      s"generation $gen has no manifest — stage before swapping")
    if (protocolFor(s, root) == "log") commitToLog(s, root, gen)
    else {
      // Record the outgoing generation FIRST: PREVIOUS is what retention
      // protects for in-flight readers of the old pointer. Crash between
      // the two writes is benign — PREVIOUS then names the still-live
      // generation, which the sweep keeps anyway.
      currentGen(s, root).foreach(old => writePointer(s, root, "PREVIOUS", old))
      writePointer(s, root, "CURRENT", gen)
    }
  }

  /** Atomically (re)write a small pointer file: write-beside, then
    * rename over ([[FileContext]] supports rename-with-overwrite; plain
    * `FileSystem.rename` refuses an existing destination, and
    * delete-then-rename would open exactly the no-pointer window this
    * module exists to close). */
  private def writePointer(s: SparkSession, root: String, name: String,
                           value: String): Unit = {
    val dst = new Path(s"$root/$name")
    val f = fs(s, dst)
    val tmp = new Path(s"$root/$name.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = f.create(tmp, false)
    out.write(value.getBytes("UTF-8")); out.close()
    val qualified = f.makeQualified(dst)
    val fc = FileContext.getFileContext(qualified.toUri, s.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp), qualified, Options.Rename.OVERWRITE)
  }

  /** Stage + swap + retention sweep: the multi-table atomic commit. */
  def publishGeneration(s: SparkSession, root: String,
                        tables: Seq[(String, DataFrame)]): String = {
    val gen = stageGeneration(s, root, tables)
    swapPointer(s, root, gen)
    sweep(s, root)
    gen
  }

  /** Resolve CURRENT once and return every table of that generation —
    * the all-or-nothing read view. Resolving per-table instead would
    * re-open the very mixed-generation window the pointer closes. */
  def readGeneration(s: SparkSession, root: String): Map[String, DataFrame] = {
    val gen = currentGen(s, root).getOrElse(
      throw new IllegalStateException(s"no generation published under $root"))
    val dir = genDir(root, gen)
    val f = fs(s, dir)
    val in = f.open(new Path(dir, "_MANIFEST.json"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    val tables = "\"([^\"]+)\"".r.findAllMatchIn(
        txt.substring(txt.indexOf("[")))
      .map(_.group(1)).toSeq
    tables.map(t => t -> s.read.parquet(new Path(dir, t).toString)).toMap
  }

  /** Retention: keep the live generation and the generation the previous
    * CURRENT actually named (in-flight readers of the old pointer —
    * the PREVIOUS pointer, recorded at swap time). Everything else goes,
    * including staged-but-never-swapped orphans from crashed writers: no
    * reader can be scanning a generation CURRENT never named, and they
    * are NOT predecessors however new they sort (ADVICE r15). Roots
    * written before PREVIOUS existed fall back to the newest generation
    * strictly OLDER than live by generation number — an orphan (staged
    * after live, so numbered >= live) can never be mistaken for the
    * predecessor under that order either. */
  def sweep(s: SparkSession, root: String): Unit = {
    val gens = new Path(s"$root/generations")
    val f = fs(s, gens)
    if (f.exists(gens)) {
      val live = currentGen(s, root)
      val all = f.listStatus(gens).map(_.getPath.getName).sorted
      def num(n: String): Int =
        n.split("-").lift(1).flatMap(_.toIntOption).getOrElse(Int.MaxValue)
      val pred = previousGen(s, root).filter(all.contains).orElse(
        live.flatMap(l => all.filter(n => num(n) < num(l)).lastOption))
      val keep = (live ++ pred).toSet
      all.filter(n => !keep(n)).foreach(n => f.delete(new Path(gens, n), true))
    }
    val rootP = new Path(root)
    if (f.exists(rootP))
      f.listStatus(rootP).map(_.getPath)
        .filter(p => p.getName.startsWith("CURRENT.tmp-") ||
          p.getName.startsWith("PREVIOUS.tmp-"))
        .foreach(p => f.delete(p, false))
    // Log trim: drop commits below the predecessor's slot. Deleting an
    // immutable old commit is reader-safe (readers resolve the TOP
    // readable slot; anything below pred is at least two generations
    // stale) and keeps each publish's slot re-list O(recent). Torn
    // commits ABOVE pred stay until they age below it — they still own
    // their slot number for the writer CAS.
    val commits = readCommits(s, root)
    if (commits.size > 1) {
      val keepFrom = commits(1)._1
      val dir = logDir(root)
      val lf = fs(s, dir)
      lf.listStatus(dir).map(_.getPath).foreach(p => p.getName match {
        case CommitRe(n) if n.toInt < keepFrom => lf.delete(p, false)
        case _ =>
      })
    }
  }
}
