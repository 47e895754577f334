package graft

import graft.sources.{Schemas, Tables}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Declared StructTypes must match the driver's parquet files — if the
  * testdata schema ever drifts, fail here, loudly, not in a query. */
class SchemasSpec extends SparkSpec {

  test("declared schemas read every table (analysis + one row materialized)") {
    Schemas.byName.keys.foreach { name =>
      val df = spark.read.schema(Schemas.byName(name)).parquet(s"$sf/$name.parquet")
      // head(1) materializes every declared column through the vectorized
      // reader — a type mismatch (e.g. the events ns-timestamp) throws here
      assert(df.select(df.columns.map(org.apache.spark.sql.functions.col): _*).head(1).nonEmpty, name)
    }
  }

  test("declared schemas match parquet footers exactly (names + order)") {
    Schemas.byName.foreach { case (name, schema) =>
      val inferred = spark.read.parquet(s"$sf/$name.parquet").schema
      assert(inferred.fieldNames.toSeq == schema.fieldNames.toSeq, s"$name field names/order")
    }
  }

  test("events.ts converts ns -> µs TimestampType without precision loss") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType == TimestampType)
    val raw = spark.read.schema(Schemas.events).parquet(s"$sf/events.parquet")
    assert(raw.schema("ts").dataType == LongType)
    val rawNs = raw.orderBy("event_id").select("ts").head.getLong(0)
    val conv = e.orderBy("event_id").select("ts").head.getTimestamp(0)
    // epoch µs of the converted value == ns div 1000
    val us = conv.getTime * 1000L + (conv.getNanos / 1000L) % 1000L
    assert(us == rawNs / 1000L, s"ns=$rawNs µs=$us")
  }

  test("profile: one pass, hand-checkable stats, nulls counted") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (10L, Some("b")))
      .toDF("id", "v")
    val out = graft.sources.Catalog.profile(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("id") == ((4L, 4L, 4L, "1", "3")),
      s"lexicographic min/max on the string form ('10' < '2'): got ${out("id")}")
    assert(out("v") == ((4L, 3L, 2L, "a", "b")), s"nulls excluded: ${out("v")}")
  }
}
