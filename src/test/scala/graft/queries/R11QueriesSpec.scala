package graft.queries

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the round-11 analytics kernels: DTW against a reference
  * in-JVM DP, PAVA pooling + monotonicity, Friedman's perfect-ordering
  * closed form, assortativity bounds. The query fns run end-to-end
  * against a synthetic events.parquet dir, exercising the same code
  * path the driver grades. */
class R11QueriesSpec extends GraftSpec {

  private def byName(name: String) = R11Queries.defs.find(_.name == name).get.fn

  /** (tsMicros, userId, eventType, value) rows → a temp sf-dir with
    * events.parquet in the driver's schema. */
  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r11ev").toString
    rows.zipWithIndex
      .map { case ((us, uid, et, v), i) => (i.toLong, us, uid, et, v, "{}") }
      .toDF("event_id", "__us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("__us"))).drop("__us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def refDtw(a: Seq[Long], b: Seq[Long]): Long = {
    val INF = 100000000000000L
    val dp = Array.fill(a.size + 1, b.size + 1)(INF)
    dp(0)(0) = 0L
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    dp(a.size)(b.size)
  }

  private val day0 = 1704067200000000L // 2024-01-01 UTC in micros
  private def onDay(k: Int, n: Int, et: String): Seq[(Long, Long, String, Double)] =
    (0 until n).map(i => (day0 + k * 86400000000L + i * 1000000L, i.toLong, et, 1.0))

  test("q_dtw_distance matches the reference DP on an uneven pair") {
    val va = Seq(3, 0, 5, 2, 4) // views per day
    val pb = Seq(1, 4, 0, 2, 6) // purchases per day
    val rows = va.zipWithIndex.flatMap { case (n, k) => onDay(k, n, "view") } ++
      pb.zipWithIndex.flatMap { case (n, k) => onDay(k, n, "purchase") }
    val out = byName("q_dtw_distance")(spark, eventsDir(rows)).head()
    assert(out.getAs[Long]("n_days") === 5L)
    assert(out.getAs[Long]("dtw") === refDtw(va.map(_.toLong), pb.map(_.toLong)))
  }

  test("q_dtw_distance is zero for identical series") {
    val c = Seq(2, 3, 1)
    val rows = c.zipWithIndex.flatMap { case (n, k) =>
      onDay(k, n, "view") ++ onDay(k, n, "purchase") }
    assert(byName("q_dtw_distance")(spark, eventsDir(rows))
      .head().getAs[Long]("dtw") === 0L)
  }

  test("q_isotonic_calibration pools a decreasing pair to the joint mean") {
    // bin 0 (value 10): converting view; bin 1 (value 30): non-converting —
    // a monotonicity violation PAVA must pool to 1/2 on both bins.
    val rows = Seq(
      (day0, 1L, "view", 10.0), (day0 + 3600000000L, 1L, "purchase", 1.0),
      (day0, 2L, "view", 30.0))
    val out = byName("q_isotonic_calibration")(spark, eventsDir(rows))
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("rate_ppm")).toSeq === Seq(1000000L, 0L))
    assert(out.map(_.getAs[Long]("iso_ppm")).toSeq === Seq(500000L, 500000L))
  }

  test("q_isotonic_calibration: fit is monotone and mean-preserving on sf0.001") {
    val out = byName("q_isotonic_calibration")(spark, "/root/testdata/sf0.001")
      .orderBy("bin").collect()
    val iso = out.map(_.getAs[Long]("iso_ppm"))
    assert(iso.zip(iso.tail).forall { case (x, y) => x <= y }, "monotone")
    val n = out.map(_.getAs[Long]("n")).sum
    val pos = out.map(_.getAs[Long]("pos")).sum
    val wmean = out.map(r => r.getAs[Long]("iso_ppm") * r.getAs[Long]("n")).sum
    // PAVA preserves the weighted mean up to the 1-ppm quantization per bin
    assert(math.abs(wmean - pos * 1000000L) <= n)
  }

  test("q_friedman_test: perfect consistent ordering gives n(k-1)") {
    // 2 days × 3 types with the same strict order each day → chi2 = n(k-1) = 4
    val rows = Seq(
      (day0, 1L, "click", 1.0), (day0, 1L, "view", 2.0), (day0, 1L, "purchase", 3.0),
      (day0 + 86400000000L, 1L, "click", 1.5),
      (day0 + 86400000000L, 1L, "view", 2.5),
      (day0 + 86400000000L, 1L, "purchase", 3.5))
    val out = byName("q_friedman_test")(spark, eventsDir(rows)).head()
    assert(out.getAs[Long]("n") === 2L)
    assert(out.getAs[Long]("k") === 3L)
    assert(out.getAs[Long]("df") === 2L)
    assert(out.getAs[Double]("chi2_f") === 4.0 +- 1e-9)
  }

  test("q_graph_assortativity is a correlation in [-1, 1] over an even edge count") {
    val out = byName("q_graph_assortativity")(spark, "/root/testdata/sf0.001").head()
    val r = out.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0)
    assert(out.getAs[Long]("n_edges") % 2 === 0L) // both orientations present
  }
}
