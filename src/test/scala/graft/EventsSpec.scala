package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

/** Batch event operators not already pinned by the oracle/streaming
  * suites: semi-structured props extraction edge cases. */
class EventsSpec extends SparkSpec {
  private lazy val sp = spark
  import sp.implicits._

  test("props extraction: malformed/missing JSON degrades to NULL, not an error") {
    val events = Seq(
      (1L, "click", """{"k": 7}"""),
      (2L, "click", """{"k": 17}"""),
      (3L, "click", "not json at all"),
      (4L, "click", """{"other": 1}"""),
      (5L, "view", null.asInstanceOf[String]),
    ).toDF("event_id", "event_type", "props")
    val out = Events.propsAgg(events)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2))).toList
    // k=7 and k=17 share bucket 7; malformed/missing/null all land in the
    // NULL bucket (schema-on-read: bad shapes are data, not exceptions)
    assert(out.contains(("click", 7L, 2L)), s"got $out")
    assert(out.count(_._2 == null) == 2, s"null buckets per type: $out")
  }
}
