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

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("funnel: stages require strict order; co-timestamped rows break ties by event_id") {
    val events = Seq(
      // u1: clean signup -> click -> purchase
      (101L, 1L, ts(100), "signup"), (102L, 1L, ts(200), "click"),
      (103L, 1L, ts(300), "purchase"),
      // u2: click BEFORE signup never qualifies; purchase without a
      // qualifying click doesn't either -> reaches signup only
      (201L, 2L, ts(100), "click"), (202L, 2L, ts(200), "signup"),
      (203L, 2L, ts(300), "purchase"),
      // u3: all three co-timestamped — event_id order is the tiebreak, so
      // click(302) sees signup(301) and purchase(303) sees click(302)
      (301L, 3L, ts(100), "signup"), (302L, 3L, ts(100), "click"),
      (303L, 3L, ts(100), "purchase"),
      // u4: purchase only -> reaches nothing
      (401L, 4L, ts(500), "purchase"),
      // u5: purchase between signup and click doesn't count; the later one does
      (501L, 5L, ts(100), "signup"), (502L, 5L, ts(150), "purchase"),
      (503L, 5L, ts(200), "click"), (504L, 5L, ts(300), "purchase"),
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.funnel(events).orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toList
    assert(out === List((1, "signup", 4L, null), (2, "click", 3L, 0.75),
      (3, "purchase", 3L, 1.0)), s"got $out")
  }

  test("spikes: cold start is NULL, constant baseline gives no z, spike flags") {
    import graft.operators.Events.{SpikeMinBaseline => MinB}
    // one event per (hour, i) row; counts alternate 9/11 for 30 hours
    // (mean 10, var 1), then hour 30 carries 100 events — a clear spike
    val rows = (0 until 30).flatMap { h =>
      val c = if (h % 2 == 0) 9 else 11
      (0 until c).map(i => (h.toLong * 100 + i, ts(h * 3600L), "click", 1.0, 7L))
    } ++ (0 until 100).map(i => (9000L + i, ts(30 * 3600L), "click", 1.0, 7L))
    val events = rows.toDF("event_id", "ts", "event_type", "value", "user_id")
    val out = graft.operators.Events.spikes(events).orderBy("hour").collect()
    assert(out.length === 31)
    // rows before MinB baseline hours: NULL stats
    (0 until MinB).foreach { h =>
      assert(out(h).isNullAt(out(h).fieldIndex("z")), s"hour $h should be cold")
      assert(!out(h).getAs[Boolean]("spike"))
    }
    // the spike hour: baseline mean 10, std 1 -> z = 90
    val last = out.last
    assert(last.getAs[Long]("n") === 100L)
    assert(last.getAs[Double]("baseline_mean") === 10.0)
    assert(last.getAs[Double]("baseline_std") === 1.0)
    assert(last.getAs[Double]("z") === 90.0 && last.getAs[Boolean]("spike"))
    // a mid-series normal hour is not flagged
    assert(!out(25).getAs[Boolean]("spike"))
  }

  test("cdc apply: last-write-wins, tombstone removal, resurrection after delete") {
    val events = Seq(
      // u1: insert then two updates -> final value is the LAST update's
      (101L, 1L, ts(100), "signup", 1.0),
      (102L, 1L, ts(200), "click", 2.0),
      (103L, 1L, ts(300), "purchase", 3.0),
      // u2: updated then deleted -> absent from final state
      (201L, 2L, ts(100), "signup", 9.0),
      (202L, 2L, ts(200), "error", 0.0),
      // u3: deleted then RE-INSERTED -> present with the re-insert value
      (301L, 3L, ts(100), "error", 0.0),
      (302L, 3L, ts(200), "signup", 7.5),
      // u4: co-timestamped update and delete -> event_id breaks the tie,
      // delete (402) is later -> absent
      (401L, 4L, ts(100), "view", 4.0),
      (402L, 4L, ts(100), "error", 0.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.cdcApply(events).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getDouble(2), r.getLong(3), r.getLong(4))).toList
    assert(out === List(
      (1L, 300L, 3.0, 3L, 0L),
      (3L, 200L, 7.5, 2L, 1L),
    ), s"got $out")
  }

  test("new users: first-day flag, returning split, cum = running sum of news") {
    def day(d: Int, sec: Long) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2024-01-$d%02d").getTime + sec * 1000L)
    val events = Seq(
      // u1 twice on day 1 (one active row, 2 events), returns day 2
      (1L, day(1, 10)), (1L, day(1, 20)), (1L, day(2, 10)),
      // u2 and u3 first appear day 2; u3 returns day 3
      (2L, day(2, 30)), (3L, day(2, 40)), (3L, day(3, 50)),
    ).toDF("user_id", "ts")
    val out = Events.newUsers(events).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    // (day, active, new, n_events, returning, cum)
    assert(out === List(
      ("2024-01-01", 1L, 1L, 2L, 0L, 1L),
      ("2024-01-02", 3L, 2L, 3L, 1L, 3L),
      ("2024-01-03", 1L, 0L, 1L, 1L, 3L),
    ), s"got $out")
  }

  test("wau: trailing-7-day distinct via bounded explode, edge of window counts") {
    def day(d: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2024-01-$d%02d").getTime)
    // u2 active day2 stays weekly-active through day8 (inclusive);
    // u1's window (day1..day7) does NOT reach day8
    val events = Seq((1L, day(1)), (2L, day(1)), (2L, day(2)), (3L, day(8)))
      .toDF("user_id", "ts")
    val out = Events.wau(events).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(out === List(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-08", 1L, 2L, 0.5),
    ), s"got $out")
  }

  test("transitions: lag pairs per user, row-normalized probabilities") {
    val events = Seq(
      (1L, 1L, ts(100), "a"), (2L, 1L, ts(200), "b"), (3L, 1L, ts(300), "a"),
      (4L, 2L, ts(100), "a"), (5L, 2L, ts(200), "b"),
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.transitions(events).orderBy("prev_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(out === List(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)), s"got $out")
  }

  test("slo: breach by exact cross-multiplication, boundary is NOT a breach") {
    def at(hour: Int, sec: Long) = ts(hour * 3600L + sec)
    // hour 0: 1 error in 8 (12.5%) -> breach; hour 1: 1 error in exactly
    // 40 (2.5% == budget, strict >) -> no breach
    val h0 = (1 to 7).map(i => (i.toLong, 1L, at(0, i * 10L), "click")) :+
      (8L, 1L, at(0, 100L), "error")
    val h1 = (1 to 39).map(i => (100L + i, 1L, at(1, i * 10L), "click")) :+
      (140L, 1L, at(1, 400L), "error")
    val out = Events.slo((h0 ++ h1).toDF("event_id", "user_id", "ts", "event_type"))
      .orderBy("hour").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4))).toList
    assert(out === List((8L, 1L, true), (40L, 1L, false)), s"got $out")
  }

  test("attribution: last preceding touch wins; error/no-touch fall to direct") {
    val events = Seq(
      // u1: click then purchase; later view then purchase
      (101L, 1L, ts(100), "click", 10.0), (102L, 1L, ts(200), "purchase", 5.0),
      (103L, 1L, ts(300), "view", 0.0), (104L, 1L, ts(400), "purchase", 7.0),
      // u2: purchase with no prior anything
      (201L, 2L, ts(100), "purchase", 3.0),
      // u3: error is not a touch channel
      (301L, 3L, ts(100), "error", 0.0), (302L, 3L, ts(200), "purchase", 2.0),
      // u4: co-timestamped click/view — event_id order makes view the last touch
      (401L, 4L, ts(100), "click", 0.0), (402L, 4L, ts(100), "view", 0.0),
      (403L, 4L, ts(100), "purchase", 4.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.attribution(events).orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(out === List(
      ("click", 1L, 5.0), ("direct", 2L, 5.0), ("view", 2L, 11.0)), s"got $out")
  }
}
