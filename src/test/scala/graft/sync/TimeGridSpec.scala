package graft.sync

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Y3/Y4 grid semantics: inclusive-start date_range tick count, end
  * included only when on-grid, overlap window math. */
class TimeGridSpec extends GraftSpec {

  test("tickCount: inclusive start, end only if on-grid") {
    assert(TimeGrid.tickCount(0L, 100L, 33L) === 4)   // 0,33,66,99
    assert(TimeGrid.tickCount(0L, 99L, 33L) === 4)    // end on-grid: 0,33,66,99
    assert(TimeGrid.tickCount(0L, 32L, 33L) === 1)    // only the start
    assert(TimeGrid.tickCount(5L, 5L, 33L) === 1)     // degenerate span
  }

  test("grid materializes exactly those ticks, partition-parallel") {
    val ticks = TimeGrid.grid(spark, 1000000L, 1100000L, 33000L, "tick", partitions = 3)
      .select(unix_micros(col("tick"))).collect().map(_.getLong(0)).sorted
    assert(ticks.toSeq === Seq(1000000L, 1033000L, 1066000L, 1099000L))
  }

  test("overlapWindowUs intersects spans; disjoint/empty -> None") {
    val a = tsDf("ts", Seq(0L, 10000000L))
    val b = tsDf("ts", Seq(4000000L, 20000000L))
    assert(TimeGrid.overlapWindowUs(a, "ts", b, "ts") === Some((4000000L, 10000000L)))
    val c = tsDf("ts", Seq(50000000L, 60000000L))
    assert(TimeGrid.overlapWindowUs(a, "ts", c, "ts") === None)
    val empty = tsDf("ts", Seq.empty[Long])
    assert(TimeGrid.overlapWindowUs(a, "ts", empty, "ts") === None)
  }
}
