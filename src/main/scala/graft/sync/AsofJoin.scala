package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Y5 — as-of resample: align a (possibly irregular) series onto a set
  * of grid ticks, per `df.reindex(grid, method)` in the reference
  * (`/root/reference/app.py:164-165`), method ∈ {pad, backfill, nearest}.
  *
  * Verified semantics (SURVEY.md §2.4 Y5):
  *  - pad:      last series row with ts <= tick; null if none;
  *  - backfill: first series row with ts >= tick; null if none;
  *  - nearest:  row minimizing |ts - tick|; never null (clamps at the
  *              edges); **ties break to the LATER timestamp**;
  *  - an exact tick == ts match returns that row under all methods.
  *
  * Scale design — the reason this module exists: the naive formulation
  * (`last(...) OVER (ORDER BY ts)` with no partitioning) serializes the
  * whole dataset through ONE partition. Instead we bucket the time axis
  * (`bucketUs`, default 1 h) and run two cheap passes:
  *
  *   1. union grid markers with series rows, window **partitioned by
  *      time bucket** → within-bucket as-of (parallel across buckets);
  *   2. per-bucket "last payload" aggregate (one row per non-empty
  *      bucket — tiny) → prefix-scan over buckets → broadcast back as
  *      the carry-in for ticks that precede every series row in their
  *      bucket.
  *
  * Net cost: one shuffle of (grid ∪ series) on bucket + one broadcast
  * join. No global sort, no single-partition stage on the big data;
  * the only single-partition window runs on the bucket digest
  * (span/bucketUs rows). This holds at 1000 executors: choose bucketUs
  * so span/bucketUs ≳ cluster parallelism.
  *
  * Caveat: series rows must be unique per timestamp (dedupe upstream,
  * e.g. `groupBy(ts).agg(...)`) — same requirement pandas' reindex
  * imposes on its index.
  */
object AsofJoin {

  /** CAP on the adaptive bucket width (and the fallback for an empty
    * input): long spans keep the cross-bucket digest ≤ span/1 h rows. */
  val DefaultBucketUs: Long = 3600000000L // 1 hour

  /** Cap on the adaptive `uniformGrid` bucket size (ticks/bucket). */
  val DefaultBucketTicks: Long = 65536L

  /** Sentinel: derive the bucket width from the data (the default). */
  val Adaptive: Long = -1L

  /** Identity on a double, deliberately declared nondeterministic: a
    * pushdown fence for the interp blend. The value is a pure function
    * of its input (results never change), but the flag keeps the
    * optimizer from substituting the blend expression into downstream
    * filters — which otherwise quintuples the generated code of the
    * final stage and stalls whole-stage codegen compilation (see the
    * call site). */
  private val interpBarrier =
    org.apache.spark.sql.functions.udf((x: java.lang.Double) => x)
      .asNondeterministic()

  /** Bucket width from (span, parallelism): ~4 buckets per core so the
    * scheduler can balance uneven buckets, capped at `DefaultBucketUs`.
    * A fixed width degenerates to ONE bucket when the span is shorter
    * than it — a single-partition window on the big data, the exact
    * failure this module exists to avoid. */
  def adaptiveBucketUs(spanUs: Long, parallelism: Int): Long =
    math.max(1L, math.min(DefaultBucketUs,
      spanUs / math.max(1L, 4L * parallelism)))

  /** Tick-bucket size from (nTicks, parallelism) — same policy. */
  def adaptiveBucketTicks(nTicks: Long, parallelism: Int): Long =
    math.max(1L, math.min(DefaultBucketTicks,
      nTicks / math.max(1L, 4L * parallelism)))

  /** pad/ffill: for each grid tick, the last series row at ts <= tick. */
  def pad(grid: DataFrame, gridTs: String, series: DataFrame, seriesTs: String,
          valueCols: Seq[String], bucketUs: Long = Adaptive,
          srcTsCol: String = "src_ts"): DataFrame =
    directional(grid, gridTs, series, seriesTs, valueCols, bucketUs, srcTsCol, sign = 1L)

  /** backfill/bfill: first series row at ts >= tick — pad on the
    * time-reversed axis. */
  def backfill(grid: DataFrame, gridTs: String, series: DataFrame, seriesTs: String,
               valueCols: Seq[String], bucketUs: Long = Adaptive,
               srcTsCol: String = "src_ts"): DataFrame =
    directional(grid, gridTs, series, seriesTs, valueCols, bucketUs, srcTsCol, sign = -1L)

  /** Resolve an adaptive bucket width: one min/max agg over the
    * already-built union (a cheap column scan relative to the shuffle
    * that follows; callers that know their span pass `bucketUs`
    * explicitly and skip it). */
  private def resolveBucketUs(u0: DataFrame, bucketUs: Long): Long =
    if (bucketUs > 0) bucketUs
    else {
      val r = u0.agg(min(col("__t")), max(col("__t"))).head()
      if (r.isNullAt(0)) DefaultBucketUs
      else adaptiveBucketUs(r.getLong(1) - r.getLong(0) + 1,
        u0.sparkSession.sparkContext.defaultParallelism)
    }

  /** nearest: min |ts - tick|, tie -> later ts, never null when the
    * series is non-empty (SURVEY §2.4).
    *
    * Fused single-shuffle formulation: ONE bucketed shuffle of
    * (grid ∪ series) computes BOTH directions as two window frames
    * over the same partitioning (forward last / backward first), so
    * there is no second union pass and — unlike composing pad+backfill
    * — no grid-sized join to recombine them. The equal-timestamp case
    * rides the forward frame (series sorts before the grid marker at
    * equal __t), and the backward side reuses it when src == tick. */
  def nearest(grid: DataFrame, gridTs: String, series: DataFrame, seriesTs: String,
              valueCols: Seq[String], bucketUs: Long = Adaptive,
              srcTsCol: String = "src_ts"): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one value column")
    val payload = struct(
      unix_micros(col(seriesTs)).as("__src") +: valueCols.map(col): _*)
    val s = series.select(
      unix_micros(col(seriesTs)).as("__t"), lit(0).as("__g"), payload.as("__p"))
    val payloadType = s.schema("__p").dataType
    val g = grid.select(
      unix_micros(col(gridTs)).as("__t"), lit(1).as("__g"),
      lit(null).cast(payloadType).as("__p"))

    val u0 = g.unionByName(s)
    val effBucketUs = resolveBucketUs(u0, bucketUs)
    def bucketed(df: DataFrame): DataFrame =
      df.withColumn("__b", expr(s"__t div ${effBucketUs}L"))

    val u = bucketed(u0)
    // one shuffle, two running frames over it. The backward pass is a
    // DESC-ordered running `last` rather than an UnboundedFollowing
    // frame: Spark executes UnboundedFollowing by rescanning the
    // partition tail per row (O(n²)); the desc formulation is a second
    // in-partition sort (O(n log n)) over the same exchange. At equal
    // __t the grid marker precedes series rows under BOTH orderings
    // (asc: series __g=0 first -> fwd sees them; desc: grid __g=1
    // first -> backward excludes them), so an exact tick==ts match
    // rides the forward side only, reconciled below.
    val wF = Window.partitionBy("__b").orderBy(col("__t").asc, col("__g").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wB = Window.partitionBy("__b").orderBy(col("__t").desc, col("__g").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val inBucket = u
      .withColumn("__pf", last(col("__p"), ignoreNulls = true).over(wF))
      .withColumn("__pb", last(col("__p"), ignoreNulls = true).over(wB))
      .filter(col("__g") === 1)

    // tiny per-bucket digest: last + first series payload per bucket,
    // prefix-scanned forward and suffix-scanned backward for carries
    val bucketDigest = bucketed(s).groupBy("__b").agg(
      max_by(col("__p"), col("__t")).as("__last"),
      min_by(col("__p"), col("__t")).as("__first"))
    val gridBuckets = bucketed(g).select("__b").distinct()
      .select(col("__b"), lit(1).as("__g"),
        lit(null).cast(payloadType).as("__last"),
        lit(null).cast(payloadType).as("__first"))
    val ub = bucketDigest.select(col("__b"), lit(0).as("__g"), col("__last"), col("__first"))
      .unionByName(gridBuckets)
    // forward carry: strictly-earlier buckets (grid row precedes its
    // bucket's series digest under __g desc); backward carry: strictly
    // -later buckets (digest precedes grid row under __g asc)
    val wCF = Window.orderBy(col("__b").asc, col("__g").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // backward carry as a desc-ordered running last (same O(n²)
    // avoidance as wB): at a grid row, the most recently seen digest
    // under (__b desc, __g desc) is the nearest strictly-later bucket
    val wCB = Window.orderBy(col("__b").desc, col("__g").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carry = ub
      .withColumn("__cf", last(col("__last"), ignoreNulls = true).over(wCF))
      .withColumn("__cb", last(col("__first"), ignoreNulls = true).over(wCB))
      .filter(col("__g") === 1).select(col("__b"), col("__cf"), col("__cb"))

    val joined = inBucket.join(broadcast(carry), Seq("__b"), "left")
    val fwd = coalesce(col("__pf"), col("__cf"))
    val backRaw = coalesce(col("__pb"), col("__cb"))
    // equal-t series rows sort before the grid marker, so only the
    // forward frame sees them; an exact match is both pad and backfill
    val back = when(fwd.getField("__src") === col("__t"), fwd).otherwise(backRaw)
    val dPad = col("__t") - fwd.getField("__src")
    val dBack = back.getField("__src") - col("__t")
    // tie (dPad == dBack) -> backward side = LATER timestamp [verified]
    val useBack = fwd.isNull || (back.isNotNull && dBack <= dPad)
    val pick = when(useBack, back).otherwise(fwd)
    joined.select(
      timestamp_micros(col("__t")).as(gridTs) +:
        timestamp_micros(pick.getField("__src")).as(srcTsCol) +:
        valueCols.map(c => pick.getField(c).as(c)): _*)
  }

  /** Shared directional kernel. sign = 1 -> pad, -1 -> backfill (axis
    * reversal flips <= into >= while reusing the same window shape). */
  private def directional(grid: DataFrame, gridTs: String, series: DataFrame,
                          seriesTs: String, valueCols: Seq[String], bucketUs: Long,
                          srcTsCol: String, sign: Long): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one value column")
    val payload = struct(
      unix_micros(col(seriesTs)).as("__src") +: valueCols.map(col): _*)
    val s = series.select(
      (unix_micros(col(seriesTs)) * sign).as("__t"), lit(0).as("__g"),
      payload.as("__p"))
    val payloadType = s.schema("__p").dataType
    val g = grid.select(
      (unix_micros(col(gridTs)) * sign).as("__t"), lit(1).as("__g"),
      lit(null).cast(payloadType).as("__p"))

    val u0 = g.unionByName(s)
    val effBucketUs = resolveBucketUs(u0, bucketUs)
    def bucketed(df: DataFrame): DataFrame =
      df.withColumn("__b", expr(s"__t div ${effBucketUs}L"))

    val u = bucketed(u0)
    // Within one bucket: series rows sort before the grid marker at an
    // equal __t (__g asc), so tick == ts matches its own row (inclusive).
    val w = Window.partitionBy("__b").orderBy(col("__t").asc, col("__g").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val inBucket = u.withColumn("__pp", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__g") === 1)

    // Bucket digest: last series payload per bucket (one row per
    // non-empty bucket), prefix-scanned to give each grid bucket its
    // carry-in from strictly earlier buckets. This table is tiny by
    // construction (time-span / bucketUs rows), so the single-partition
    // window below is deliberate, not an oversight.
    val bucketLast = bucketed(s).groupBy("__b")
      .agg(max_by(col("__p"), col("__t")).as("__p"))
    val gridBuckets = bucketed(g).select("__b").distinct()
      .select(col("__b"), lit(1).as("__g"), lit(null).cast(payloadType).as("__p"))
    val ub = bucketLast.select(col("__b"), lit(0).as("__g"), col("__p"))
      .unionByName(gridBuckets)
    // __g desc: the grid marker precedes same-bucket series rows, so the
    // (-inf, -1) frame sees only strictly-earlier buckets.
    val wb = Window.orderBy(col("__b").asc, col("__g").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = ub.withColumn("__pc", last(col("__p"), ignoreNulls = true).over(wb))
      .filter(col("__g") === 1).select(col("__b"), col("__pc"))

    val joined = inBucket.join(broadcast(carry), Seq("__b"), "left")
      .withColumn("__pf", coalesce(col("__pp"), col("__pc")))
    joined.select(
      timestamp_micros(col("__t") * sign).as(gridTs) +:
        timestamp_micros(col("__pf").getField("__src")).as(srcTsCol) +:
        valueCols.map(c => col("__pf").getField(c).as(c)): _*)
  }

  /** As-of resample onto a UNIFORM grid (lo + k·step, k < n) — the
    * specialization every reference pipeline actually hits (Y4 grids
    * are `date_range`s).
    *
    * Why a separate kernel: the generic path shuffles the ENTIRE
    * series unioned with the grid. On a uniform grid the candidate
    * tick of each series row is closed-form, so the series pass is a
    * map-side-combined groupBy(tick): shuffle volume drops from
    * O(|series|) to O(n ticks) — the difference between shuffling
    * 100 TB and shuffling the grid. The tick axis is then gap-filled
    * with the same bucketed running-window + digest-carry scan as the
    * generic kernel (parallel across tick buckets).
    *
    *  - pad candidate of tick k: last row with ts <= lo+k·step; a row
    *    at offset d=ts-lo belongs to tick ceil(d/step) (clamped at 0;
    *    rows past the last tick pad nothing);
    *  - backfill candidate: first row with ts >= tick; row belongs to
    *    floor(d/step) (clamped at n-1; rows before lo backfill
    *    nothing);
    *  - nearest: combine both runnings, tie -> later ts [verified].
    */
  def uniformGrid(spark: org.apache.spark.sql.SparkSession,
                  series: DataFrame, seriesTs: String, valueCols: Seq[String],
                  loUs: Long, stepUs: Long, nTicks: Long, method: String,
                  tickCol: String = "tick", srcTsCol: String = "src_ts",
                  bucketTicks: Long = Adaptive,
                  tieCol: Option[String] = None): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one value column")
    require(stepUs > 0 && nTicks > 0, "grid must be non-empty")
    // closed-form (unlike the generic kernels, no data scan needed)
    val effBucketTicks =
      if (bucketTicks > 0) bucketTicks
      else adaptiveBucketTicks(nTicks, spark.sparkContext.defaultParallelism)
    val needPad = method != "backfill"
    val needBack = method != "pad"

    val t = unix_micros(col(seriesTs))
    val payload = struct(t.as("__src") +: valueCols.map(col): _*)
    val d = t - lit(loUs)
    // exact integer floor-division (d may be negative; `div` truncates
    // toward zero, so go through pmod)
    def floorDiv(x: Column): Column = (x - pmod(x, lit(stepUs))) / lit(stepUs)

    // `tieCol` fuses an upstream "dedupe to one row per ts keeping the
    // MAX tie value" (pandas-reindex precondition) into this aggregate:
    // the ordering key becomes (ts, tie) lexicographic, so the winner
    // per tick is exactly the winner of dedupe-then-asof — and the
    // O(|series|) dedupe shuffle disappears.
    val src = series.select(
      Seq(t.as("__t"), payload.as("__p"),
        floorDiv(d + stepUs - 1).cast("long").as("__kp"),
        floorDiv(d).cast("long").as("__kb")) ++
        tieCol.map(c => col(c).as("__tie")): _*)
    val payloadType = src.schema("__p").dataType
    val ordPad = tieCol.map(_ => struct(col("__t"), col("__tie")))
      .getOrElse(struct(col("__t")))
    val ordBack = tieCol.map(_ => struct(col("__t"), -col("__tie")))
      .getOrElse(struct(col("__t")))

    def agg(keyExpr: Column, keep: Column, pick: Column => Column, name: String) =
      src.filter(keep).groupBy(keyExpr.as("__k"))
        .agg(pick(col("__p")).as(name))

    val ticks = spark.range(0, nTicks).select(col("id").as("__k"))
    var joined = ticks
    if (needPad && needBack) {
      // both directions in ONE scan + ONE map-combined shuffle: each
      // row explodes into its (side, tick) assignments, and the
      // null-ordering convention of max_by/min_by confines each
      // aggregate to its side's rows. At 100 TB this halves the input
      // reads of `nearest` vs running the two directional aggregates.
      val side = col("__e").getField("__side")
      val tagged = src.select(
        Seq(col("__p"), col("__t"),
          explode(array(
            struct(lit(0).as("__side"),
              greatest(col("__kp"), lit(0L)).as("__k"),
              (col("__kp") <= nTicks - 1).as("__keep")),
            struct(lit(1).as("__side"),
              least(col("__kb"), lit(nTicks - 1)).as("__k"),
              (col("__kb") >= 0L).as("__keep")))).as("__e")) ++
          tieCol.map(_ => col("__tie")): _*)
        .filter(col("__e").getField("__keep"))
      val bothAgg = tagged.groupBy(col("__e").getField("__k").as("__k")).agg(
        max_by(when(side === 0, col("__p")), when(side === 0, ordPad)).as("__ap"),
        min_by(when(side === 1, col("__p")), when(side === 1, ordBack)).as("__ab"))
      joined = joined.join(bothAgg, Seq("__k"), "left")
    } else {
      if (needPad) joined = joined.join(
        agg(greatest(col("__kp"), lit(0L)), col("__kp") <= nTicks - 1,
          p => max_by(p, ordPad), "__ap"), Seq("__k"), "left")
      else joined = joined.withColumn("__ap", lit(null).cast(payloadType))
      if (needBack) joined = joined.join(
        agg(least(col("__kb"), lit(nTicks - 1)), col("__kb") >= 0L,
          p => min_by(p, ordBack), "__ab"), Seq("__k"), "left")
      else joined = joined.withColumn("__ab", lit(null).cast(payloadType))
    }
    val bucketed = joined.withColumn("__bk", expr(s"__k div ${effBucketTicks}L"))

    // in-bucket gap fill (one row per tick -> no marker rows needed)
    val wF = Window.partitionBy("__bk").orderBy(col("__k").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wB = Window.partitionBy("__bk").orderBy(col("__k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    var filled = bucketed
    if (needPad) filled = filled.withColumn("__fp",
      last(col("__ap"), ignoreNulls = true).over(wF))
    if (needBack) filled = filled.withColumn("__fb",
      last(col("__ab"), ignoreNulls = true).over(wB))

    // tiny cross-bucket carry digest (one row per non-empty bucket)
    val digest = bucketed.groupBy("__bk").agg(
      max_by(col("__ap"), when(col("__ap").isNotNull, col("__k"))).as("__dl"),
      min_by(col("__ab"), when(col("__ab").isNotNull, col("__k"))).as("__df"))
    val wCF = Window.orderBy(col("__bk").asc).rowsBetween(Window.unboundedPreceding, -1)
    val wCB = Window.orderBy(col("__bk").desc).rowsBetween(Window.unboundedPreceding, -1)
    val carry = digest
      .withColumn("__cf", last(col("__dl"), ignoreNulls = true).over(wCF))
      .withColumn("__cb", last(col("__df"), ignoreNulls = true).over(wCB))
      .select(col("__bk"), col("__cf"), col("__cb"))

    val withCarry = filled.join(broadcast(carry), Seq("__bk"), "left")
    val fwd = if (needPad) coalesce(col("__fp"), col("__cf")) else lit(null).cast(payloadType)
    val back = if (needBack) coalesce(col("__fb"), col("__cb")) else lit(null).cast(payloadType)

    if (method == "interp") {
      // Linear time-weighted interpolation between the pad neighbor
      // (t0, v0) and the backfill neighbor (t1, v1):
      //   v(tick) = v0 + (v1 - v0) * (tick - t0) / (t1 - t0)
      // A tick landing exactly on a sample returns that sample (both
      // neighbors collapse to it). No extrapolation: ticks before the
      // first or after the last sample stay NULL. Value columns come
      // back as DOUBLE; `srcTsCol` does not apply (two sources per
      // tick) and is omitted. Same single-shuffle plan as `nearest`.
      val tickUs = lit(loUs) + col("__k") * stepUs
      val t0 = fwd.getField("__src")
      val t1 = back.getField("__src")
      val frac = (tickUs - t0).cast("double") / (t1 - t0).cast("double")
      withCarry.select(
        timestamp_micros(tickUs).as(tickCol) +:
          valueCols.map { c =>
            val v0 = fwd.getField(c).cast("double")
            val v1 = back.getField(c).cast("double")
            // same pushdown fence as the fused kernel: a downstream
            // dropna filter must reference the attribute, not inline
            // this blend into a huge generated filter stage
            interpBarrier(
              when(fwd.isNull || back.isNull, lit(null).cast("double"))
                .when(t1 === t0, v0)
                .otherwise(v0 + (v1 - v0) * frac))
              .as(c)
          }: _*)
    } else {
      val pick = method match {
        case "pad" | "ffill"      => fwd
        case "backfill" | "bfill" => back
        case "nearest" =>
          val tickUs = lit(loUs) + col("__k") * stepUs
          val dPad = tickUs - fwd.getField("__src")
          val dBack = back.getField("__src") - tickUs
          // tie -> backward side = LATER timestamp [verified]
          when(fwd.isNull || (back.isNotNull && dBack <= dPad), back).otherwise(fwd)
        case other => throw new IllegalArgumentException(s"unknown method: $other")
      }
      withCarry.select(
        timestamp_micros(lit(loUs) + col("__k") * stepUs).as(tickCol) +:
          timestamp_micros(pick.getField("__src")).as(srcTsCol) +:
          valueCols.map(c => pick.getField(c).as(c)): _*)
    }
  }

  /** One resampled series for `uniformGridFused`: the frame, its
    * timestamp column, the value columns to carry, and the output
    * column prefix (`""` keeps the names). */
  case class GridSeries(df: DataFrame, tsCol: String,
                        valueCols: Seq[String], prefix: String)

  /** The FUSED synchronization kernel — N series as-of-resampled onto
    * ONE uniform grid in a single map-combined shuffle (the composed
    * reference pipeline's Y5+Y6 core, `/root/reference/app.py:164-176`).
    *
    * Why it exists: composing `uniformGrid` per sensor + an equi-join
    * is semantically identical but schedules one shuffle PER SENSOR
    * plus a tick-axis join. The per-sensor aggregates share the same
    * key (the tick), so they fuse: every series row explodes into its
    * pad/backfill tick assignments carrying its own sensor's payload
    * slot (null in the others), and ONE groupBy(tick) computes all
    * 2·N directional payload picks. The per-sensor gap-fill windows
    * and the cross-bucket carry digest then ride the SAME per-tick
    * frame — the whole alignment is one O(ticks) shuffle, one window
    * pass, one broadcast digest, regardless of N. Same per-sensor
    * semantics as `uniformGrid` (tie → later ts for nearest; tieCol
    * fuses the per-ts max dedupe).
    *
    * The event one-hot (Y7) deliberately does NOT fuse here: the
    * struct-payload max_by buffers force this aggregate off
    * whole-stage codegen, and routing every event row through it was
    * measured slower than `EventPivot`'s separate int-buffer pivot.
    *
    * All sensors must share the method and (when given) the tieCol's
    * data type — the union branches need one ordering-struct type. */
  def uniformGridFused(spark: org.apache.spark.sql.SparkSession,
                       sensors: Seq[GridSeries],
                       loUs: Long, stepUs: Long, nTicks: Long, method: String,
                       tickCol: String = "tick",
                       tieCol: Option[String] = None,
                       bucketTicks: Long = Adaptive): DataFrame = {
    require(sensors.nonEmpty, "fused grid needs at least one series")
    require(sensors.forall(_.valueCols.nonEmpty), "asof join needs value columns")
    require(stepUs > 0 && nTicks > 0, "grid must be non-empty")
    val needPad = method != "backfill" && method != "bfill"
    val needBack = method != "pad" && method != "ffill"
    val effBucketTicks =
      if (bucketTicks > 0) bucketTicks
      else adaptiveBucketTicks(nTicks, spark.sparkContext.defaultParallelism)

    def floorDiv(x: Column): Column = (x - pmod(x, lit(stepUs))) / lit(stepUs)

    // per-sensor payload/ordering struct TYPES (needed for the null
    // slots in the other branches of the union)
    val payloadTypes = sensors.map { gs =>
      gs.df.select(struct(unix_micros(col(gs.tsCol)).as("__src") +:
        gs.valueCols.map(col): _*).as("__p")).schema("__p").dataType
    }
    def nullP(i: Int) = lit(null).cast(payloadTypes(i))

    // one branch per sensor: explode each row into its admissible
    // (side, tick) assignments with the payload in slot i
    val sensorBranches = sensors.zipWithIndex.map { case (gs, i) =>
      val t = unix_micros(col(gs.tsCol))
      val payload = struct(t.as("__src") +: gs.valueCols.map(col): _*)
      val d = t - lit(loUs)
      val kp = floorDiv(d + stepUs - 1).cast("long")
      val kb = floorDiv(d).cast("long")
      // ordering-struct fields are aliased explicitly: the branches
      // union positionally, and auto-generated field names would
      // diverge (failing analysis) for sensors whose timestamp/tie
      // columns are named differently
      val ordP = tieCol.map(tc => struct(t.as("__t"), col(tc).as("__tie")))
        .getOrElse(struct(t.as("__t")))
      // backfill wants the EARLIEST ts but the LARGEST tie at equal
      // ts — negate the tie inside a min_by (the uniformGrid rule)
      val ordB = tieCol.map(tc => struct(t.as("__t"), (-col(tc)).as("__tie")))
        .getOrElse(struct(t.as("__t")))
      val assignments =
        (if (needPad)
          Seq(struct(lit(0).as("__side"), greatest(kp, lit(0L)).as("__k"),
            (kp <= nTicks - 1).as("__keep"))) else Nil) ++
        (if (needBack)
          Seq(struct(lit(1).as("__side"), least(kb, lit(nTicks - 1)).as("__k"),
            (kb >= 0L).as("__keep"))) else Nil)
      gs.df.select(explode(array(assignments: _*)).as("__e"),
          payload.as("__pp"), ordP.as("__opp"), ordB.as("__obb"))
        .filter(col("__e").getField("__keep"))
        .select(Seq(col("__e").getField("__k").as("__k"),
          col("__e").getField("__side").as("__side"), lit(i).as("__s"),
          col("__opp").as("__op"), col("__obb").as("__ob")) ++
          sensors.indices.map(j =>
            (if (j == i) col("__pp") else nullP(j)).as(s"__p$j")): _*)
    }
    val unioned = sensorBranches.reduce(_ unionAll _)

    // ONE groupBy(tick): the null-ordering convention of max_by/min_by
    // confines each aggregate to its own (sensor, side) rows
    val aggs =
      sensors.indices.flatMap { i =>
        val mine = col("__s") === i
        (if (needPad)
          Seq(max_by(when(mine && col("__side") === 0, col(s"__p$i")),
            when(mine && col("__side") === 0, col("__op"))).as(s"__ap$i"))
        else Nil) ++
        (if (needBack)
          Seq(min_by(when(mine && col("__side") === 1, col(s"__p$i")),
            when(mine && col("__side") === 1, col("__ob"))).as(s"__ab$i"))
        else Nil)
      }
    val perTick = unioned.groupBy(col("__k")).agg(aggs.head, aggs.tail: _*)

    var joined = spark.range(0, nTicks).select(col("id").as("__k"))
      .join(perTick, Seq("__k"), "left")
    for (i <- sensors.indices) {
      if (!needPad) joined = joined.withColumn(s"__ap$i", nullP(i))
      if (!needBack) joined = joined.withColumn(s"__ab$i", nullP(i))
    }
    val bucketed = joined.withColumn("__bk", expr(s"__k div ${effBucketTicks}L"))

    // in-bucket gap fill — all 2·N last() columns share the two
    // window specs, so Spark runs them in one pass each
    val wF = Window.partitionBy("__bk").orderBy(col("__k").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wB = Window.partitionBy("__bk").orderBy(col("__k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    var filled = bucketed
    for (i <- sensors.indices) {
      if (needPad) filled = filled.withColumn(s"__fp$i",
        last(col(s"__ap$i"), ignoreNulls = true).over(wF))
      if (needBack) filled = filled.withColumn(s"__fb$i",
        last(col(s"__ab$i"), ignoreNulls = true).over(wB))
    }

    // tiny cross-bucket carry digest (one row per non-empty bucket)
    val digestAgg = {
      val exprs = sensors.indices.flatMap { i =>
        Seq(max_by(col(s"__ap$i"),
            when(col(s"__ap$i").isNotNull, col("__k"))).as(s"__dl$i"),
          min_by(col(s"__ab$i"),
            when(col(s"__ab$i").isNotNull, col("__k"))).as(s"__df$i"))
      }
      bucketed.groupBy("__bk").agg(exprs.head, exprs.tail: _*)
    }
    val wCF = Window.orderBy(col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCB = Window.orderBy(col("__bk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    var carry = digestAgg
    for (i <- sensors.indices) {
      carry = carry
        .withColumn(s"__cf$i", last(col(s"__dl$i"), ignoreNulls = true).over(wCF))
        .withColumn(s"__cb$i", last(col(s"__df$i"), ignoreNulls = true).over(wCB))
    }
    carry = carry.select(col("__bk") +:
      sensors.indices.flatMap(i => Seq(col(s"__cf$i"), col(s"__cb$i"))): _*)
    val withCarry = filled.join(broadcast(carry), Seq("__bk"), "left")

    val tickUs = lit(loUs) + col("__k") * stepUs
    val sensorCols = sensors.zipWithIndex.flatMap { case (gs, i) =>
      val fwd = if (needPad) coalesce(col(s"__fp$i"), col(s"__cf$i")) else nullP(i)
      val back = if (needBack) coalesce(col(s"__fb$i"), col(s"__cb$i")) else nullP(i)
      def out(c: String) = if (gs.prefix.isEmpty) c else s"${gs.prefix}_$c"
      if (method == "interp") {
        val t0 = fwd.getField("__src")
        val t1 = back.getField("__src")
        val frac = (tickUs - t0).cast("double") / (t1 - t0).cast("double")
        gs.valueCols.map { c =>
          val v0 = fwd.getField(c).cast("double")
          val v1 = back.getField(c).cast("double")
          // interpBarrier: identity, but it stops predicate pushdown
          // from substituting this whole blend into a downstream
          // dropna filter. Without it the generated filter stage
          // carries ~5 inlined copies of the blend and whole-stage
          // codegen recompiles a huge class on every fresh plan —
          // measured +1.9 s per run on the flagship (4.70 s vs 2.81 s
          // warm; with codegen disabled the two methods tie, so the
          // cost is code SIZE, not arithmetic).
          interpBarrier(
            when(fwd.isNull || back.isNull, lit(null).cast("double"))
              .when(t1 === t0, v0)
              .otherwise(v0 + (v1 - v0) * frac))
            .as(out(c))
        }
      } else {
        val pick = method match {
          case "pad" | "ffill"      => fwd
          case "backfill" | "bfill" => back
          case "nearest" =>
            val dPad = tickUs - fwd.getField("__src")
            val dBack = back.getField("__src") - tickUs
            when(fwd.isNull || (back.isNotNull && dBack <= dPad), back)
              .otherwise(fwd)
          case other => throw new IllegalArgumentException(s"unknown method: $other")
        }
        gs.valueCols.map(c => pick.getField(c).as(out(c)))
      }
    }
    withCarry.select(timestamp_micros(tickUs).as(tickCol) +: sensorCols: _*)
  }

  /** KEYED as-of join — the trade/quote shape: for each left row, the
    * last right row with the SAME KEY and rightTs <= leftTs (null when
    * the key has no earlier right row). Right rows must be unique per
    * (key, ts) — dedupe upstream, as with the grid kernels.
    *
    * Scale design mirrors the grid kernel, with the key joining the
    * partitioning: one shuffle of (left ∪ right) on (key, time
    * bucket) → within-bucket forward fill (parallel across keys AND
    * buckets); then a per-(key, bucket) digest (one row per pair —
    * tiny relative to the data) carries the last right payload across
    * a key's empty buckets via an ordinary per-key ordered window on
    * the digest. No global sort; no single-partition stage; the carry
    * join is a plain shuffle join on (key, bucket). */
  def keyedPad(left: DataFrame, leftTs: String,
               right: DataFrame, rightTs: String,
               keyCols: Seq[String], valueCols: Seq[String],
               bucketUs: Long = Adaptive,
               srcTsCol: String = "src_ts"): DataFrame = {
    require(keyCols.nonEmpty, "keyed as-of needs at least one key column")
    require(valueCols.nonEmpty, "asof join needs at least one value column")
    val leftCols = left.columns.toSeq
    val keyExprs = keyCols.map(col)
    val rPayload = struct(
      unix_micros(col(rightTs)).as("__src") +: valueCols.map(col): _*)
    val lPayload = struct(leftCols.map(col): _*)
    val l = left.select(keyExprs ++ Seq(unix_micros(col(leftTs)).as("__t"),
      lit(1).as("__g"), lPayload.as("__l")): _*)
    val lType = l.schema("__l").dataType
    val r = right.select(keyExprs ++ Seq(unix_micros(col(rightTs)).as("__t"),
      lit(0).as("__g"), rPayload.as("__p")): _*)
    val pType = r.schema("__p").dataType
    val u0 = r.withColumn("__l", lit(null).cast(lType))
      .unionByName(l.withColumn("__p", lit(null).cast(pType)))
    val effBucketUs = resolveBucketUs(u0, bucketUs)
    val u = u0.withColumn("__b", expr(s"__t div ${effBucketUs}L"))

    // right row sorts before a left marker at the same (key, ts), so
    // an exact-timestamp quote is visible to its trade (ts <= leftTs)
    val wF = Window.partitionBy(keyExprs :+ col("__b"): _*)
      .orderBy(col("__t").asc, col("__g").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = u.withColumn("__fp", last(col("__p"), ignoreNulls = true).over(wF))

    // per-(key, bucket) digest over ALL buckets the key touches (left
    // markers included, so keys idle on the right side still carry)
    val digest = u.groupBy(keyExprs :+ col("__b"): _*)
      .agg(max_by(col("__p"), when(col("__p").isNotNull, col("__t"))).as("__dl"))
    val wC = Window.partitionBy(keyExprs: _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = digest
      .withColumn("__cf", last(col("__dl"), ignoreNulls = true).over(wC))
      .select(keyExprs :+ col("__b") :+ col("__cf"): _*)

    val pick = coalesce(col("__fp"), col("__cf"))
    filled.join(carry, keyCols :+ "__b", "left")
      .filter(col("__g") === 1)
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        Seq(timestamp_micros(pick.getField("__src")).as(srcTsCol)) ++
        valueCols.map(c => pick.getField(c).as(c)): _*)
  }

  /** Convenience dedupe: collapse duplicate timestamps keeping the row
    * with the greatest tiebreaker (deterministic input for the kernel). */
  def dedupeByTs(series: DataFrame, tsCol: String, tieCol: String): DataFrame = {
    val others = series.columns.filterNot(_ == tsCol)
    series.groupBy(col(tsCol))
      .agg(max_by(struct(others.map(col): _*), col(tieCol)).as("__r"))
      .select(col(tsCol) +: others.map(c => col("__r").getField(c).as(c)): _*)
  }
}
