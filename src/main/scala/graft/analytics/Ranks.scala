package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed exact ranking primitives — the replacements for
  * `Window.orderBy(...)` with NO partition spec, which serializes the
  * whole input through one task (`WindowExec: No Partition Defined`).
  *
  * Two tools:
  *
  *  1. [[withGlobalRank]] — exact 1-based global rank via TeraSort
  *     machinery: range partitioning (each task owns a disjoint key
  *     range) + `zipWithIndex` (per-partition local index + one count
  *     job for the offsets). No task ever sees more than its range.
  *
  *  2. [[ntileColumn]] — exact `ntile(k)` WITHOUT ranking the data at
  *     all: the k-1 bucket-boundary KEYS are collected from the
  *     ranked projection of the SORT COLUMNS ONLY (a driver digest of
  *     k rows), and each row's bucket is a codegen'd CASE counting
  *     how many boundaries precede it — no shuffle, no window in the
  *     assigning pass. Requires a TIE-FREE ordering (include a unique
  *     key column), which every caller in this repo already has.
  *
  * Correctness of the boundary count: with unique keys and
  * nondecreasing boundary end-ranks e_1 <= ... <= e_{k-1}, a row of
  * rank r lies in bucket B iff e_{B-1} < r <= e_B, so exactly the
  * B-1 boundaries below it compare strictly smaller — duplicate
  * boundary keys from empty tail buckets count zero extra. The
  * ScalaTest law in RanksSpec pins equality with `ntile` itself.
  */
object Ranks {

  /** (column name, descending?) sort spec. */
  type SortSpec = Seq[(String, Boolean)]

  private def orderCols(sortCols: SortSpec): Seq[Column] =
    sortCols.map { case (c, desc) => if (desc) col(c).desc else col(c).asc }

  /** Exact 1-based global rank under `sortCols` appended as `rankCol`.
    * Range partition + per-partition index + broadcast offsets; the
    * result is RDD-backed (rank assignment is eager — it runs the
    * count job at construction). */
  def withGlobalRank(df: DataFrame, rankCol: String,
                     sortCols: SortSpec): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols(sortCols): _*)
      .sortWithinPartitions(orderCols(sortCols): _*)
    val schema = sorted.schema
      .add(rankCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }

  /** The end-rank of each of the first k-1 ntile buckets for n rows:
    * ntile semantics — first n%k buckets hold n/k+1 rows, the rest
    * n/k. Nondecreasing; may repeat when buckets are empty (n < k). */
  private[analytics] def boundaryRanks(n: Long, k: Int): Seq[Long] = {
    val q = n / k; val r = n % k
    (1 until k).map { b =>
      if (b <= r) b * (q + 1) else r * (q + 1) + (b - r) * q
    }.map(e => math.max(e, 1L))
  }

  /** Collect the k-1 ntile boundary key tuples of `df` under
    * `sortCols` — the broadcastable digest. Only the sort columns are
    * shuffled (a narrow projection of the input). */
  def ntileBoundaries(df: DataFrame, k: Int, sortCols: SortSpec): Seq[Row] = {
    val proj = df.select(sortCols.map(c => col(c._1)): _*)
    val sorted = proj
      .repartitionByRange(orderCols(sortCols): _*)
      .sortWithinPartitions(orderCols(sortCols): _*)
      .rdd.zipWithIndex()
    val n = sorted.count()
    require(n > 0, "ntileBoundaries: empty input")
    val wanted = boundaryRanks(n, k).toSet
    val picked = sorted
      .filter { case (_, i) => wanted.contains(i + 1) }
      .map { case (r, i) => (i + 1) -> r }
      .collect().toMap
    boundaryRanks(n, k).map(picked)
  }

  /** `ntile(k) OVER (ORDER BY sortCols)` as a shuffle-free Column:
    * 1 + (number of boundary keys strictly before this row). Pass the
    * boundaries from [[ntileBoundaries]] on the SAME DataFrame and
    * sort spec. */
  def ntileColumn(boundaries: Seq[Row], sortCols: SortSpec): Column = {
    // lexicographic "row strictly AFTER boundary" under the sort spec
    def after(b: Row): Column =
      sortCols.zipWithIndex.map { case ((c, desc), i) =>
        val eqPrefix = sortCols.take(i).zipWithIndex
          .map { case ((pc, _), j) => col(pc) <=> lit(b.get(j)) }
          .foldLeft(lit(true))(_ && _)
        val strict =
          if (desc) col(c) < lit(b.get(i)) else col(c) > lit(b.get(i))
        eqPrefix && strict
      }.reduce(_ || _)
    boundaries.map(b => when(after(b), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
  }

  /** One-call convenience: exact ntile(k) as `out`, assigned by the
    * broadcast-boundary CASE. Runs the two digest jobs (rank + count)
    * eagerly, but the RETURNED plan is a pure projection of `df` —
    * no shuffle, no window, safe to persist/reuse. */
  def withNtile(df: DataFrame, k: Int, out: String,
                sortCols: SortSpec): DataFrame =
    df.withColumn(out,
      ntileColumn(ntileBoundaries(df, k, sortCols), sortCols).cast("int"))
}
