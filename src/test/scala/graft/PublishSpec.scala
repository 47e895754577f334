package graft

import graft.sources.Publish

/** Crash-window semantics of the manifest-pointer multi-table commit
  * (VERDICT r14 #5): a writer dying between table writes must leave
  * readers on the complete OLD generation, and the pointer swap must
  * flip all tables at once. */
class PublishSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_publish").toString

  test("crash between staging and swap leaves readers on the old generation") {
    val root = freshRoot()
    Publish.publishGeneration(sp, root, Seq(
      "dim" -> Seq((1, "a")).toDF("id", "v"),
      "fact" -> Seq((1, 10L)).toDF("id", "x")))
    // writer "crashes" here: generation 2 fully staged, pointer untouched
    Publish.stageGeneration(sp, root, Seq(
      "dim" -> Seq((1, "a"), (2, "b")).toDF("id", "v"),
      "fact" -> Seq((1, 10L), (2, 20L)).toDF("id", "x")))
    val g = Publish.readGeneration(sp, root)
    assert(g("dim").count() == 1 && g("fact").count() == 1,
      "both tables must still read the OLD generation — no mixed state")
  }

  test("pointer swap flips every table of the generation at once") {
    val root = freshRoot()
    Publish.publishGeneration(sp, root, Seq(
      "dim" -> Seq((1, "a")).toDF("id", "v"),
      "fact" -> Seq((1, 10L)).toDF("id", "x")))
    val gen2 = Publish.stageGeneration(sp, root, Seq(
      "dim" -> Seq((1, "a"), (2, "b")).toDF("id", "v"),
      "fact" -> Seq((1, 10L), (2, 20L)).toDF("id", "x")))
    Publish.swapPointer(sp, root, gen2)
    val g = Publish.readGeneration(sp, root)
    assert(g("dim").count() == 2 && g("fact").count() == 2)
    assert(Publish.currentGen(sp, root).contains(gen2))
  }

  test("retention keeps live + predecessor, drops older gens and tmp pointers") {
    val root = freshRoot()
    val gens = (1 to 3).map { i =>
      Publish.publishGeneration(sp, root,
        Seq("t" -> Seq((i, i.toLong)).toDF("id", "x")))
    }
    val dir = new java.io.File(s"$root/generations")
    val onDisk = dir.listFiles().map(_.getName).toSet
    assert(onDisk == Set(gens(1), gens(2)),
      s"expected live+predecessor, got $onDisk")
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith("CURRENT.tmp-")), "tmp pointers swept")
    // the live generation is the last published one
    assert(Publish.readGeneration(sp, root)("t").head().getInt(0) == 3)
  }

  test("a staged-but-never-swapped orphan is not mistaken for the predecessor") {
    // ADVICE r15 (medium): the old sweep inferred the predecessor as the
    // lexicographically-last NON-LIVE generation. A writer that crashed
    // between stage and swap leaves an orphan that sorts NEWER than the
    // real predecessor; the next publish's sweep then kept the orphan
    // and deleted the generation in-flight readers of the old CURRENT
    // may still be scanning. PREVIOUS (recorded at swap) names the real
    // predecessor; the orphan — which no reader can hold, CURRENT never
    // named it — is swept as a separate class.
    val root = freshRoot()
    Publish.publishGeneration(sp, root,
      Seq("t" -> Seq((1, 1L)).toDF("id", "x")))
    val gen2 = Publish.publishGeneration(sp, root,
      Seq("t" -> Seq((2, 2L)).toDF("id", "x")))
    // crashed writer: staged after gen2, never swapped
    val orphan = Publish.stageGeneration(sp, root,
      Seq("t" -> Seq((99, 99L)).toDF("id", "x")))
    val gen3 = Publish.publishGeneration(sp, root,
      Seq("t" -> Seq((3, 3L)).toDF("id", "x")))
    val onDisk = new java.io.File(s"$root/generations")
      .listFiles().map(_.getName).toSet
    assert(onDisk == Set(gen2, gen3),
      s"retention must keep the REAL predecessor $gen2 (in-flight readers) " +
        s"and drop the never-swapped orphan $orphan, got $onDisk")
    assert(Publish.previousGen(sp, root).contains(gen2))
  }

  test("swap refuses a generation without a manifest; empty root refuses reads") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      Publish.swapPointer(sp, root, "gen-000099-deadbeef")
    }
    intercept[IllegalStateException] { Publish.readGeneration(sp, root) }
  }

  // ---- the rename-free commit-log protocol (VERDICT r15 #4) -----------

  /** Run `body` with the log protocol forced via conf, restoring after. */
  private def withLog[T](body: => T): T = {
    sp.conf.set("spark.graft.publish.protocol", "log")
    try body finally sp.conf.unset("spark.graft.publish.protocol")
  }

  test("log protocol: publish/read/retention end-to-end, no pointer files") {
    withLog {
      val root = freshRoot()
      val gens = (1 to 3).map { i =>
        Publish.publishGeneration(sp, root,
          Seq("t" -> Seq((i, i.toLong)).toDF("id", "x")))
      }
      assert(Publish.currentGen(sp, root).contains(gens(2)))
      assert(Publish.previousGen(sp, root).contains(gens(1)))
      assert(Publish.readGeneration(sp, root)("t").head().getInt(0) == 3)
      val rootFiles = new java.io.File(root).listFiles().map(_.getName).toSet
      assert(!rootFiles("CURRENT") && !rootFiles("PREVIOUS"),
        s"log roots must not write pointer files, got $rootFiles")
      val onDisk = new java.io.File(s"$root/generations")
        .listFiles().map(_.getName).toSet
      assert(onDisk == Set(gens(1), gens(2)),
        s"retention keeps live+predecessor under the log too, got $onDisk")
      // log trimmed to [pred, live]
      val slots = new java.io.File(s"$root/_log").listFiles().map(_.getName)
        .filter(_.endsWith(".commit")).sorted
      assert(slots.toSeq == Seq("c-00000002.commit", "c-00000003.commit"),
        s"got ${slots.toSeq}")
    }
  }

  test("log protocol: staged-but-never-committed orphan leaves readers untouched and sweeps") {
    withLog {
      val root = freshRoot()
      val gen1 = Publish.publishGeneration(sp, root,
        Seq("t" -> Seq((1, 1L)).toDF("id", "x")))
      // writer crashes after staging, before the commit PUT
      val orphan = Publish.stageGeneration(sp, root,
        Seq("t" -> Seq((99, 99L)).toDF("id", "x")))
      assert(Publish.currentGen(sp, root).contains(gen1),
        "an uncommitted stage must be invisible")
      assert(Publish.readGeneration(sp, root)("t").head().getInt(0) == 1)
      val gen3 = Publish.publishGeneration(sp, root,
        Seq("t" -> Seq((3, 3L)).toDF("id", "x")))
      val onDisk = new java.io.File(s"$root/generations")
        .listFiles().map(_.getName).toSet
      assert(onDisk == Set(gen1, gen3),
        s"sweep keeps {live=$gen3, pred=$gen1}, drops orphan $orphan: $onDisk")
    }
  }

  test("log protocol: losing the commit-slot CAS retries the next slot (last-wins kept)") {
    withLog {
      val root = freshRoot()
      Publish.publishGeneration(sp, root,
        Seq("t" -> Seq((1, 1L)).toDF("id", "x")))
      // a racing writer takes the next slot first
      val racer = new java.io.File(s"$root/_log/c-00000002.commit")
      java.nio.file.Files.writeString(racer.toPath, "gen-racer")
      val gen = Publish.stageGeneration(sp, root,
        Seq("t" -> Seq((2, 2L)).toDF("id", "x")))
      Publish.swapPointer(sp, root, gen)
      assert(Publish.currentGen(sp, root).contains(gen),
        "the later writer must land on slot 3 and win")
      assert(Publish.previousGen(sp, root).contains("gen-racer"))
    }
  }

  test("log protocol: a torn top commit (interrupted PUT) is skipped by readers") {
    withLog {
      val root = freshRoot()
      val gen1 = Publish.publishGeneration(sp, root,
        Seq("t" -> Seq((1, 1L)).toDF("id", "x")))
      // simulated interrupted PUT: the slot name exists, zero bytes
      val torn = new java.io.File(s"$root/_log/c-00000002.commit")
      assert(torn.createNewFile())
      assert(Publish.currentGen(sp, root).contains(gen1),
        "an unreadable commit is not a commit")
      assert(Publish.readGeneration(sp, root)("t").head().getInt(0) == 1)
      // and the next writer skips PAST the torn slot, never colliding
      val gen3 = Publish.publishGeneration(sp, root,
        Seq("t" -> Seq((3, 3L)).toDF("id", "x")))
      assert(Publish.currentGen(sp, root).contains(gen3))
      assert(new java.io.File(s"$root/_log/c-00000003.commit").exists())
    }
  }

  test("log protocol: commit path never renames (simulated object store)") {
    // The whole point: on a filesystem whose rename THROWS, the log
    // protocol's make-live path (manifest check -> commit -> resolve ->
    // sweep) completes. The generation is hand-staged through the FS API
    // because Spark's parquet job committer renames by design — on a
    // real store that half pairs with a store-native committer.
    val hconf = sp.sparkContext.hadoopConfiguration
    hconf.set("fs.norename.impl", classOf[NoRenameFs].getName)
    val local = freshRoot()
    val root = s"norename:$local"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(hconf)
    intercept[UnsupportedOperationException] {
      f.rename(new org.apache.hadoop.fs.Path(s"$root/a"),
        new org.apache.hadoop.fs.Path(s"$root/b"))
    }
    def handStage(gen: String): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(
        s"$root/generations/$gen/_MANIFEST.json"), false)
      out.write(s"""{"generation":"$gen","tables":["t"]}""".getBytes("UTF-8"))
      out.close()
    }
    handStage("gen-000001-aaaaaaaa")
    Publish.swapPointer(sp, root, "gen-000001-aaaaaaaa") // scheme default: log
    handStage("gen-000002-bbbbbbbb")
    Publish.swapPointer(sp, root, "gen-000002-bbbbbbbb")
    handStage("gen-000003-cccccccc")
    Publish.swapPointer(sp, root, "gen-000003-cccccccc")
    Publish.sweep(sp, root)
    assert(Publish.currentGen(sp, root).contains("gen-000003-cccccccc"))
    assert(Publish.previousGen(sp, root).contains("gen-000002-bbbbbbbb"))
    assert(!new java.io.File(s"$local/generations/gen-000001-aaaaaaaa").exists(),
      "sweep works rename-free too")
    assert(!new java.io.File(s"$local/CURRENT").exists(),
      "no pointer file on a no-rename scheme")
  }

  test("log protocol: migration from a legacy pointer root keeps the pointer gen as predecessor") {
    val root = freshRoot()
    val gen1 = Publish.publishGeneration(sp, root,
      Seq("t" -> Seq((1, 1L)).toDF("id", "x"))) // pointer protocol
    assert(new java.io.File(s"$root/CURRENT").exists())
    val gen2 = withLog {
      Publish.publishGeneration(sp, root,
        Seq("t" -> Seq((2, 2L)).toDF("id", "x")))
    }
    // conf now UNSET: the existing _log keeps the root on the log protocol
    assert(Publish.protocolFor(sp, root) == "log")
    assert(Publish.currentGen(sp, root).contains(gen2), "log outranks pointer")
    assert(Publish.previousGen(sp, root).contains(gen1),
      "the legacy pointer's gen is the predecessor in-flight readers hold")
    assert(new java.io.File(s"$root/generations/$gen1").exists(),
      "sweep must have kept the pointer-era predecessor")
  }
}
