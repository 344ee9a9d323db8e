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
    * Two tiny aggregates — 4 scalars to the driver, same as the
    * reference's Y3 (`app.py:155-156`). Returns None when disjoint. */
  def overlapWindowUs(a: DataFrame, aTs: String, b: DataFrame, bTs: String): Option[(Long, Long)] = {
    val ra = a.agg(min(unix_micros(col(aTs))).as("lo"), max(unix_micros(col(aTs))).as("hi")).head()
    val rb = b.agg(min(unix_micros(col(bTs))).as("lo"), max(unix_micros(col(bTs))).as("hi")).head()
    if (ra.isNullAt(0) || rb.isNullAt(0)) return None
    val lo = math.max(ra.getLong(0), rb.getLong(0))
    val hi = math.min(ra.getLong(1), rb.getLong(1))
    if (lo > hi) None else Some((lo, hi))
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
