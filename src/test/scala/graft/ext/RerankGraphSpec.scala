package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Laws for the round-7 additions that have structure beyond their
  * oracle hash: MMR reranking, the integer PageRank, and the weighted
  * median (checked against a brute-force fold). */
class RerankGraphSpec extends GraftSpec {

  private def corpus() = {
    import spark.implicits._
    // 6 vectors in 2-D: two tight clusters (0,1,2) and (3,4), plus an
    // outlier 5. Query 100 sits nearest cluster A.
    Seq(
      (0L, Seq(1.00f, 0.00f)), (1L, Seq(0.99f, 0.10f)),
      (2L, Seq(0.98f, 0.15f)), (3L, Seq(0.70f, 0.70f)),
      (4L, Seq(0.72f, 0.69f)), (5L, Seq(-1.00f, 0.00f)),
      (100L, Seq(0.90f, 0.05f))
    ).toDF("vec_id", "embedding")
  }

  test("mmrRerank emits k distinct neighbors ranked 1..k; first pick is pure top-1 relevance") {
    val emb = corpus()
    val out = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 100L),
      k = 3, poolK = 5, lambda = 0.7).collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Int]("mmr_rank")).sorted.toSeq === Seq(1, 2, 3))
    assert(out.map(_.getAs[Long]("neighbor_id")).distinct.length === 3)
    val top = Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") === 100L), 1).head()
    val first = out.find(_.getAs[Int]("mmr_rank") == 1).get
    assert(first.getAs[Long]("neighbor_id") ===
      top.getAs[Long]("neighbor_id"))
  }

  test("mmrRerank diversifies: with the pool split across clusters, rank-2 leaves the top-1 cluster") {
    val emb = corpus()
    val out = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 100L),
      k = 2, poolK = 5, lambda = 0.3)
      .collect().sortBy(_.getAs[Int]("mmr_rank"))
    val clusterA = Set(0L, 1L, 2L)
    assert(clusterA.contains(out(0).getAs[Long]("neighbor_id")))
    // pure relevance would pick a second cluster-A member (intra-A
    // sim ≈ 0.995); at λ=0.3 the redundancy penalty must jump to the
    // 45° cluster instead
    assert(!clusterA.contains(out(1).getAs[Long]("neighbor_id")))
  }

  test("weighted median lands where cumulative weight first reaches half the total") {
    import spark.implicits._
    // weights: qty 1 -> 1.00, qty 2 -> 2.00, qty 3 -> 10.00: half of
    // 13.00 is 6.50, first qty whose running weight >= 6.5 is 3
    val df = Seq((1.0, 1.00), (2.0, 2.00), (3.0, 10.00))
      .toDF("l_quantity", "l_extendedprice")
      .withColumn("l_returnflag", lit("A"))
    val wq = df.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(sum(col("l_extendedprice").cast("decimal(14,2)")).as("w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Long.MinValue, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
    val r = wq.withColumn("cum", sum(col("w")).over(win))
      .withColumn("total", sum(col("w")).over(tot))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_quantity")).as("wm")).head()
    assert(r.getAs[Double]("wm") === 3.0)
  }

  test("integer PageRank conserves total rank mass within damping leakage and ranks the hub first") {
    import spark.implicits._
    // star graph: hub 1 connected to 2,3,4 (undirected)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("p1", "p2")
    val eb = e.select(col("p1").as("src"), col("p2").as("dst"))
      .unionAll(e.select(col("p2").as("src"), col("p1").as("dst")))
    val deg = eb.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    var r = deg.select(col("node"), lit(1000000000L).as("rank"))
    for (_ <- 1 to 3) {
      r = eb.join(r, col("src") === col("node"))
        .join(deg.select(col("node").as("dn"), col("deg")),
          col("src") === col("dn"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg((lit(150000000L) + expr("17 * sum(contrib) div 20")).as("rank"))
    }
    val ranks = r.collect().map(x =>
      x.getAs[Long]("node") -> x.getAs[Long]("rank")).toMap
    assert(ranks(1L) > ranks(2L))
    assert(ranks(2L) === ranks(3L)); assert(ranks(3L) === ranks(4L))
    // mass: 4e9 initial; each damped round keeps >= 85% and the
    // star graph loses nothing to dangling nodes
    val total = ranks.values.sum
    assert(total > (3.4e9).toLong && total <= (4.0e9).toLong + 4)
  }

  test("power-iteration integer rescale keeps the max |component| at ~1e6 ppm") {
    // directly exercise the sign/abs renormalization identity used by
    // emb_power_iteration: sgn(u) * (|u| div (mx div 1e6))
    import spark.implicits._
    val u = Seq((0, 250000000000L), (1, -125000000000L), (2, 62500000000L))
      .toDF("i", "u")
    val mx = u.agg(max(abs(col("u"))).as("mx"))
    val v = u.crossJoin(broadcast(mx))
      .select(col("i"), (when(col("u") < 0, -1L).otherwise(1L) *
        expr("abs(u) div (mx div 1000000)")).as("vp"))
      .collect().map(x => x.getAs[Int]("i") -> x.getAs[Long]("vp")).toMap
    assert(v(0) === 1000000L)
    assert(v(1) === -500000L)
    assert(v(2) === 250000L)
  }
}
