package graft.queries

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Laws for the round-11 session-4 kernels. Each law pins a closed-form
  * fixture outcome (perfect agreement → 1, homogeneous variance → 0)
  * that a same-formula-on-both-engines slip could not fake, plus sf0.001
  * range sanity. */
class R12QueriesSpec extends GraftSpec {

  private def byName(name: String) = R12Queries.defs.find(_.name == name).get.fn

  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r12ev").toString
    rows.zipWithIndex
      .map { case ((us, uid, et, v), i) => (i.toLong, us, uid, et, v, "{}") }
      .toDF("event_id", "__us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("__us"))).drop("__us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r12doc").toString
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val day0 = 1704067200000000L // 2024-01-01 UTC micros

  test("q_bartlett_test: identical group distributions give stat 0") {
    // same 4 values in each of 3 groups → all s_i² equal → T = 0
    val rows = for {
      (et, gi) <- Seq("view", "click", "purchase").zipWithIndex
      (v, j) <- Seq(1.0, 2.0, 3.0, 6.0).zipWithIndex
    } yield (day0 + (gi * 4 + j) * 1000000L, (gi * 4 + j).toLong, et, v)
    val out = byName("q_bartlett_test")(spark, eventsDir(rows)).head()
    assert(out.getAs[Double]("bartlett_stat") === 0.0)
    assert(out.getAs[Long]("df") === 2L)
  }

  test("q_bartlett_test: unequal variances give a positive stat on sf0.001") {
    val out = byName("q_bartlett_test")(spark, "/root/testdata/sf0.001").head()
    assert(out.getAs[Double]("bartlett_stat") >= 0.0)
    assert(out.getAs[Long]("n_total") === 1000L)
  }

  test("q_cronbach_alpha: perfectly parallel items give alpha 1") {
    // every user scores the same value on all 3 items → total variance
    // = k² item variance → alpha = 1
    val rows = for {
      (uid, base) <- Seq((1L, 1.0), (2L, 2.0), (3L, 5.0))
      (et, j) <- Seq("view", "click", "purchase").zipWithIndex
    } yield (day0 + (uid * 3 + j) * 1000000L, uid, et, base)
    val out = byName("q_cronbach_alpha")(spark, eventsDir(rows)).head()
    assert(out.getAs[Double]("alpha") === 1.0)
    assert(out.getAs[Long]("k_items") === 3L)
  }

  test("q_cronbach_alpha: sf0.001 alpha is finite and <= 1") {
    val a = byName("q_cronbach_alpha")(spark, "/root/testdata/sf0.001")
      .head().getAs[Double]("alpha")
    assert(!a.isNaN && a <= 1.0)
  }

  test("q_icc_deff: zero within-cluster variance gives ICC 1, DEFF m̄") {
    // each user repeats one value ×3 → SSW = 0 → ICC = 1 → DEFF = m̄ = 3
    val rows = for {
      (uid, v) <- Seq((1L, 1.0), (2L, 4.0), (3L, 9.0)); j <- 0 until 3
    } yield (day0 + (uid * 3 + j) * 1000000L, uid, "view", v)
    val out = byName("q_icc_deff")(spark, eventsDir(rows)).head()
    assert(out.getAs[Double]("icc") === 1.0)
    assert(out.getAs[Double]("deff") === 3.0)
  }

  test("q_icc_deff: sf0.001 ICC is within (-1, 1]") {
    val out = byName("q_icc_deff")(spark, "/root/testdata/sf0.001").head()
    val icc = out.getAs[Double]("icc")
    assert(icc > -1.0 && icc <= 1.0)
  }

  test("q_kendall_w: identical judge rankings give W 1") {
    // all 3 judges see the same tie-free daily counts → W = 1
    val counts = Seq(1, 2, 3, 4) // events per day, distinct → no ties
    val rows = for {
      et <- Seq("view", "click", "purchase")
      (c, k) <- counts.zipWithIndex
      i <- 0 until c
    } yield (day0 + k * 86400000000L + i * 1000000L, i.toLong, et, 1.0)
    val out = byName("q_kendall_w")(spark, eventsDir(rows)).head()
    assert(out.getAs[Double]("kendall_w") === 1.0)
    assert(out.getAs[Long]("n_days") === 4L)
    assert(out.getAs[Long]("m_judges") === 3L)
  }

  test("q_kendall_w: sf0.001 W is in [0, 1]") {
    val w = byName("q_kendall_w")(spark, "/root/testdata/sf0.001")
      .head().getAs[Double]("kendall_w")
    assert(w >= 0.0 && w <= 1.0)
  }

  test("q_gwet_ac1: unanimous raters give AC1 1") {
    // long stopword-rich docs → all three raters positive; tiny docs →
    // all negative. Perfect agreement on every doc → Pa = 1 → AC1 = 1.
    val pos = ("the a an of and to in is on for with at " * 8).trim // 96 tokens
    val rows = (0L until 4L).map(i => (i, pos + " " + "x" * 200)) ++
      (4L until 8L).map(i => (i, "tiny"))
    val out = byName("q_gwet_ac1")(spark, docsDir(rows)).head()
    assert(out.getAs[Double]("gwet_ac1") === 1.0)
    assert(out.getAs[Double]("fleiss_kappa") === 1.0)
  }

  test("q_gwet_ac1: sf0.001 AC1 and kappa are <= 1 and AC1 >= kappa here") {
    val out = byName("q_gwet_ac1")(spark, "/root/testdata/sf0.001").head()
    assert(out.getAs[Double]("gwet_ac1") <= 1.0)
    assert(out.getAs[Double]("fleiss_kappa") <= 1.0)
  }
}
