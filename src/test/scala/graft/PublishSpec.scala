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
}
