package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events table's on-disk `ts` encoding has CHANGED between data
  * generations (TIMESTAMP(NANOS) read as raw long vs TIMESTAMP(MICROS)
  * without UTC adjust read as TIMESTAMP_NTZ) — and the round-7 gate
  * silently lost every ts-dependent query to that swap. These laws pin
  * the normalizer so a third encoding flip breaks a test, not the
  * whole query surface.
  */
class TablesSpec extends GraftSpec {

  private val baseUs = 1700000000000000L // some instant, micros

  test("normalizeEventsTs folds raw int64 nanos to us-precision timestamps") {
    import spark.implicits._
    val raw = Seq((1L, baseUs * 1000 + 1999), (2L, baseUs * 1000))
      .toDF("event_id", "ts")
    val out = Tables.normalizeEventsTs(raw)
    assert(out.schema("ts").dataType === TimestampType)
    // ns -> us floors (1999 ns = 1 us), exactly DuckDB's read behavior
    val got = out.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long].collect()
    assert(got.toSeq === Seq(baseUs + 1, baseUs))
  }

  test("normalizeEventsTs folds TIMESTAMP_NTZ to the same wall-clock instant") {
    import spark.implicits._
    val ntz = Seq((1L, baseUs)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    val out = Tables.normalizeEventsTs(ntz)
    assert(out.schema("ts").dataType === TimestampType)
    // session TZ is pinned to UTC, so NTZ->TZ must be wall-clock identity
    val got = out.select(unix_micros(col("ts"))).as[Long].head()
    assert(got === baseUs)
  }

  test("normalizeEventsTs is a no-op on an already-normalized frame") {
    import spark.implicits._
    val ok = Seq((1L, baseUs)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val out = Tables.normalizeEventsTs(ok)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() === baseUs)
  }

  test("events loader and raw streaming schema agree on the test data") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1)
    // whatever the physical encoding, normalize(read-with-rawSchema)
    // must produce the same ts values the batch loader serves
    val raw = spark.read.schema(Tables.eventsRawSchema(spark, dir))
      .parquet(s"$dir/events.parquet")
    val a = Tables.normalizeEventsTs(raw)
      .agg(sum(unix_micros(col("ts")))).head().getLong(0)
    val b = ev.agg(sum(unix_micros(col("ts")))).head().getLong(0)
    assert(a === b)
  }
}
