package graft

import graft.operators.Index

class IndexSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  test("inverted index: exact df/cf, capped sorted postings, MinDf gate") {
    // "common" in docs 1..10 (df=10 > PostK=8 -> postings capped at 8);
    // "rare" twice in docs 1..3 (df=3, cf=6); "pair" in 2 docs -> below
    // MinDf=3, excluded from the index
    val docs = (1L to 10L).map { i =>
      val extra = (if (i <= 3) " rare rare" else "") + (if (i <= 2) " pair" else "")
      (i, s"common$extra")
    }.toDF("doc_id", "text")
    val out = Index.inverted(docs).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("df"),
        r.getAs[Long]("cf"), r.getAs[String]("postings"))).toList
    assert(out === List(
      ("common", 10L, 10L, "1,2,3,4,5,6,7,8"),
      ("rare", 3L, 6L, "1,2,3")), s"got $out")
  }

  test("inverted index: ordered by df desc then token; tf counted per doc") {
    val docs = Seq(
      (1L, "aa bb aa"), (2L, "aa bb"), (3L, "aa bb"), (4L, "aa")
    ).toDF("doc_id", "text")
    val out = Index.inverted(docs).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("df"), r.getAs[Long]("cf"))).toList
    // aa: df=4 cf=5 (tf=2 in doc 1); bb: df=3 cf=3; df desc ordering
    assert(out === List(("aa", 4L, 5L), ("bb", 3L, 3L)), s"got $out")
  }
}
