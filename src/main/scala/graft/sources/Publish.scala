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
  * Durability scope (same clause as `ZOrder.compact`): pointer-file
  * rename is atomic on HDFS and local filesystems but NOT on object
  * stores — there the pointer swap becomes a table-format snapshot
  * commit (Delta/Iceberg), with no change to the call shape.
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

  /** The live generation name, if any generation was ever published. */
  def currentGen(s: SparkSession, root: String): Option[String] =
    readPointer(s, new Path(s"$root/CURRENT"))

  /** The generation the previous CURRENT named — written by [[swapPointer]]
    * just before each swap, so retention keeps the generation in-flight
    * readers of the OLD pointer may still be scanning. Inferring the
    * predecessor from directory order instead is wrong: a staged-but-
    * never-swapped orphan (writer crash between stage and swap) sorts
    * newer than the real predecessor and would get kept in its place
    * while the real one is deleted under live readers (ADVICE r15). */
  def previousGen(s: SparkSession, root: String): Option[String] =
    readPointer(s, new Path(s"$root/PREVIOUS"))

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

  /** Make a staged generation live: write the pointer beside CURRENT,
    * then atomically rename over it ([[FileContext]] supports
    * rename-with-overwrite; plain `FileSystem.rename` refuses an
    * existing destination, and delete-then-rename would open exactly
    * the no-pointer window this module exists to close). */
  def swapPointer(s: SparkSession, root: String, gen: String): Unit = {
    require(fs(s, genDir(root, gen)).exists(new Path(genDir(root, gen), "_MANIFEST.json")),
      s"generation $gen has no manifest — stage before swapping")
    // Record the outgoing generation FIRST: PREVIOUS is what retention
    // protects for in-flight readers of the old pointer. Crash between
    // the two writes is benign — PREVIOUS then names the still-live
    // generation, which the sweep keeps anyway.
    currentGen(s, root).foreach(old => writePointer(s, root, "PREVIOUS", old))
    writePointer(s, root, "CURRENT", gen)
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
  }
}
