package graft.sync

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Banded range-join law: the banding rewrite must produce EXACTLY the
  * naive cross-join pair set — each unordered pair within tolerance
  * once, never twice, never a self-pair — while planning as an
  * equi-join (no cartesian/nested-loop node). */
class RangeJoinSpec extends GraftSpec {

  private val W = 1000000L // 1 s tolerance

  private def events(tsUs: Seq[Long]) = {
    import spark.implicits._
    tsUs.zipWithIndex.map { case (t, i) => (i.toLong, t, s"t${i % 3}") }
      .toDF("event_id", "__us", "event_type")
      .select(col("event_id"), timestamp_micros(col("__us")).as("ts"),
        col("event_type"))
  }

  /** Reference pair set by brute force on the driver. */
  private def naive(tsUs: Seq[Long]): Set[(Long, Long, Long)] =
    (for {
      (ta, ia) <- tsUs.zipWithIndex; (tb, ib) <- tsUs.zipWithIndex
      if ia < ib && math.abs(ta - tb) <= W
    } yield (ia.toLong, ib.toLong, math.abs(ta - tb))).toSet

  private def banded(tsUs: Seq[Long]): Set[(Long, Long, Long)] =
    RangeJoin.selfPairsWithin(events(tsUs), "ts", "event_id", W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("pair set == brute force: boundaries, ties, bucket-straddlers") {
    // crafted around the 1 s bucket edges: same-bucket pairs, pairs
    // straddling a boundary, a pair at EXACTLY the tolerance (kept),
    // one just past it (dropped), and duplicate timestamps
    val ts = Seq(0L, 900000L, 1000000L, 1100000L, 2100001L, 2100001L,
      5000000L, 6000000L, 6000001L, 9999999L)
    assert(banded(ts) === naive(ts))
    assert(banded(ts).contains((0L, 2L, W)), "|Δ| == W is inclusive")
    assert(!banded(ts).exists(p => p._1 === p._2), "no self-pairs")
  }

  test("pseudo-random spray: exact match, no duplicate pairs") {
    // deterministic LCG spray across ~20 s so all three band cases occur
    val ts = Iterator.iterate(48271L)(x => (x * 48271L) % 2147483647L)
      .take(120).map(_ % 20000000L).toSeq
    val got = RangeJoin.selfPairsWithin(events(ts), "ts", "event_id", W)
      .select("id_lo", "id_hi").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.distinct.length, "each pair exactly once")
    assert(got.toSet === naive(ts).map(p => (p._1, p._2)))
  }

  test("plans as an equi-join on the band key, not a cartesian product") {
    val plan = RangeJoin.selfPairsWithin(events(Seq(0L, 1L, 2L)), "ts",
      "event_id", W).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banded range join must not fall back to O(n²); plan:\n$plan")
  }

  test("BandedRangeJoinRule: naive epsilon join plans banded, result exact") {
    // the session registers graft.GraftExtensions, so a user writing
    // the NAIVE |ta - tb| <= W join must get the banded equi-join plan
    val ts = Iterator.iterate(16807L)(x => (x * 16807L) % 2147483647L)
      .take(80).map(_ % 10000000L).toSeq
    val ev = events(ts)
    val a = ev.select(col("event_id").as("a_id"), unix_micros(col("ts")).as("a_t"))
    val b = ev.select(col("event_id").as("b_id"), unix_micros(col("ts")).as("b_t"))
    val naiveJoin = a.join(b,
      abs(col("a_t") - col("b_t")) <= lit(W) && col("a_id") < col("b_id"))
    val plan = naiveJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule must band the epsilon join; plan:\n$plan")
    assert(plan.contains("Generate"), "banded plan explodes the left side")
    val got = naiveJoin.select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive(ts).map(p => (p._1, p._2)))
  }

  test("BandedRangeJoinRule: leaves equi-key joins alone") {
    val ev = events(Seq(0L, 500000L, 3000000L))
    val a = ev.select(col("event_id").as("a_id"), col("event_type").as("a_k"),
      unix_micros(col("ts")).as("a_t"))
    val b = ev.select(col("event_id").as("b_id"), col("event_type").as("b_k"),
      unix_micros(col("ts")).as("b_t"))
    val j = a.join(b, col("a_k") === col("b_k") &&
      abs(col("a_t") - col("b_t")) <= lit(W))
    val optimized = j.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("__graft_band"),
      s"equi-keyed join must not be banded; plan:\n$optimized")
    assert(j.count() === 3) // distinct types -> only the 3 self-matches
  }

  test("payload columns ride along, normalized lo/hi by id") {
    val out = RangeJoin.selfPairsWithin(
      events(Seq(500000L, 0L)), "ts", "event_id", W,
      payload = Seq("event_type")).collect()
    assert(out.length === 1)
    val r = out.head
    // id 0 (ts=500ms, type t0) is lo; id 1 (ts=0, type t1) is hi
    assert(r.getAs[Long]("id_lo") === 0L && r.getAs[Long]("id_hi") === 1L)
    assert(r.getAs[String]("lo_event_type") === "t0")
    assert(r.getAs[String]("hi_event_type") === "t1")
    assert(r.getAs[Long]("delta_us") === 500000L)
  }
}
