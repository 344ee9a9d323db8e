package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Y3 overlap window + Y4 uniform time grid
  * (`/root/reference/app.py:155-162`).
  *
  * The reference builds `pd.date_range(start, end, freq='33ms')` where
  * start/end are the intersection of the camera and motion spans (log
  * excluded from the window). Tick count = ⌊(end-start)/step⌋ + 1
  * (inclusive of start; end included only if it lands on the grid) —
  * [verified] in SURVEY.md §2.4.
  *
  * Scale design: the grid is generated with `spark.range(nTicks)` —
  * partition-parallel, O(1) memory per partition, no driver-side
  * materialization and no `explode` of one giant array. A 100 TB /
  * multi-year grid is just a bigger `range`.
  */
object TimeGrid {

  /** Overlap window of two timestamp columns:
    * (max of the two mins, min of the two maxes), in epoch micros.
    * ONE action — both sensors' min/max ride a single union-aggregate
    * (tagged by side), halving the scalar-digest jobs the composed
    * flagship pays before its real work. Returns None when disjoint. */
  def overlapWindowUs(a: DataFrame, aTs: String, b: DataFrame, bTs: String): Option[(Long, Long)] = {
    val rows = a.select(lit(0).as("__side"), unix_micros(col(aTs)).as("__us"))
      .unionAll(b.select(lit(1).as("__side"), unix_micros(col(bTs)).as("__us")))
      .groupBy(col("__side"))
      .agg(min(col("__us")).as("lo"), max(col("__us")).as("hi"))
      .collect()
    val bySide = rows.map(r => r.getInt(0) ->
      (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    for {
      (aLo, aHi) <- bySide.getOrElse(0, None)
      (bLo, bHi) <- bySide.getOrElse(1, None)
      lo = math.max(aLo, bLo)
      hi = math.min(aHi, bHi)
      if lo <= hi
    } yield (lo, hi)
  }

  /** Y4 — uniform grid of `stepUs`-spaced ticks covering
    * [startUs, endUs], inclusive of start, end only if on-grid
    * (pandas `date_range` semantics, `app.py:160`). */
  def grid(spark: SparkSession, startUs: Long, endUs: Long, stepUs: Long,
           tickCol: String = "tick", partitions: Int = 32): DataFrame = {
    require(stepUs > 0, "grid step must be positive")
    val n = (endUs - startUs) / stepUs + 1
    spark.range(0, n, 1, partitions)
      .select(timestamp_micros(lit(startUs) + col("id") * stepUs).as(tickCol))
  }

  /** Number of ticks for a window — grid size math (`app.py:160-161`). */
  def tickCount(startUs: Long, endUs: Long, stepUs: Long): Long =
    (endUs - startUs) / stepUs + 1
}
