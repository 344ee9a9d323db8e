package graft.sync

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Pins the [verified] Y7 semantics (app.py:178-191 / FIXTURES §A5):
  * argmin tie → EARLIER tick, strict < tolerance, same-(tick,type)
  * collisions collapse to one bit, out-of-range events clamp. */
class EventPivotSpec extends GraftSpec {

  private val MS = 1000L
  // grid: ticks at 0, 33 ms, 66 ms, 99 ms (start=0, step=33 ms, n=4)
  private val StepUs = 33 * MS
  private val N = 4L

  private def events(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (us, t) => (us, t) }.toDF("__us", "event_type")
      .select(timestamp_micros(col("__us")).as("ts"), col("event_type"))
  }

  private def bits(evs: (Long, String)*)(tolUs: Long = 100 * MS): Set[(Long, String)] =
    EventPivot.eventBits(events(evs: _*), "ts", "event_type", 0L, StepUs, N, tolUs)
      .select(unix_micros(col("tick")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("equidistant event maps to the EARLIER tick") {
    // 16.5 ms is exactly between ticks 0 and 33 ms
    assert(bits((16500L, "A"))() === Set((0L, "A")))
  }

  test("tolerance is strict: delta == tol is dropped") {
    // ticks at 0/33/66/99 ms; tol 10 ms. Events 9/10/11 ms past tick 33.
    assert(bits((42 * MS, "A"))(10 * MS) === Set((33 * MS, "A")))  // 9 ms  < 10
    assert(bits((43 * MS, "B"))(10 * MS) === Set.empty)            // 10 ms ! < 10
    assert(bits((44 * MS, "C"))(10 * MS) === Set.empty)            // 11 ms
  }

  test("same-type collisions on one tick collapse to a single bit") {
    val out = bits((1 * MS, "A"), (2 * MS, "A"), (32 * MS, "A"))()
    assert(out === Set((0L, "A"), (33 * MS, "A")))
  }

  test("out-of-range events clamp to the edge ticks") {
    // event before the grid start and after the last tick
    assert(bits((-5 * MS, "A"))() === Set((0L, "A")))
    assert(bits((104 * MS, "B"))() === Set((99 * MS, "B")))
    // clamped but outside tolerance -> dropped
    assert(bits((-200 * MS, "C"))() === Set.empty)
  }

  test("oneHot pivots to fixed event_<TYPE> columns with 0 fill") {
    val grid = tsDf("tick", Seq(0L, 33 * MS, 66 * MS, 99 * MS))
    val out = EventPivot.oneHot(grid, "tick", events((1 * MS, "A"), (34 * MS, "B")),
      "ts", "event_type", 0L, StepUs, N, 100 * MS, Some(Seq("A", "B", "C")))
      .orderBy("tick").collect()
    assert(out.head.schema.fieldNames.toSeq ===
      Seq("tick", "event_A", "event_B", "event_C"))
    val m = out.map(r => unixMicros(r.getTimestamp(0)) ->
      (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(m(0L) === ((1, 0, 0)))
    assert(m(33 * MS) === ((0, 1, 0)))
    assert(m(66 * MS) === ((0, 0, 0)))
  }

  private def unixMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000
}
