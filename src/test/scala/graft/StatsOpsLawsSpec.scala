package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the round-10 statistical / retrieval operators —
  * the properties the algorithms themselves guarantee, asserted on the
  * real sf0.001/sf0.01 outputs so a refactor that keeps the schema but
  * breaks the math fails a test, not an audit.
  */
class StatsOpsLawsSpec extends GraftSpec {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  test("q_conformal_coverage: empirical coverage honors the 90% conformal bound") {
    // split-conformal guarantees coverage >= 1 - alpha in expectation
    // over calibration draws; a single split can dip slightly below,
    // so the law asserts a soft floor (85%) plus structural sanity
    val rows = SparkEntry.queries("q_conformal_coverage")(spark, sf01).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val cov = r.getAs[Long]("coverage_ppm")
      assert(cov >= 850000L && cov <= 1000000L,
        s"${r.get(0)}: coverage $cov ppm outside the conformal regime")
      assert(r.getAs[Double]("q_hat") > 0.0)
    }
  }

  test("q_fdr_bh: the rejection set is exactly the BH step-up set") {
    val rows = SparkEntry.queries("q_fdr_bh")(spark, sf01).collect()
    assert(rows.length > 100)
    val m = rows.length.toDouble
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    val kMax = byRank.filter(r =>
      r.getAs[Double]("p") <= r.getAs[Int]("rank") * 0.05 / m)
      .map(_.getAs[Int]("rank")).lastOption.getOrElse(0)
    byRank.foreach { r =>
      assert(r.getAs[Boolean]("bh_reject") == (r.getAs[Int]("rank") <= kMax),
        s"rank ${r.getAs[Int]("rank")}: BH membership disagrees with step-up rule")
    }
    // p must be monotone in rank (the ordering the step-up rule needs)
    byRank.sliding(2).foreach { w =>
      assert(w(0).getAs[Double]("p") <= w(1).getAs[Double]("p"))
    }
  }

  test("q_lttb_downsample: one point per non-empty bucket, endpoints kept") {
    val sel = SparkEntry.queries("q_lttb_downsample")(spark, sf01).collect()
    val buckets = sel.map(_.getAs[Long]("bucket"))
    assert(buckets.distinct.length == buckets.length,
      "a bucket selected more than one point")
    // endpoints: the series' first point is bucket 0's x=0 row; the
    // last point has the maximum x of the whole series
    val ev = graft.sources.Tables.events(spark, sf01)
      .filter(col("event_type") === "view")
      .agg(min(expr("unix_micros(ts) div 1000000")).as("t0"),
        max(expr("unix_micros(ts) div 1000000")).as("t1")).collect()(0)
    val span = ev.getAs[Long]("t1") - ev.getAs[Long]("t0")
    assert(sel.head.getAs[Long]("x_sec") == 0L, "first point not kept")
    assert(sel.last.getAs[Long]("x_sec") == span, "last point not kept")
  }

  test("text_ndcg_eval: NDCG is normalized and the ideal ranking dominates") {
    val rows = SparkEntry.queries("text_ndcg_eval")(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val dcg = r.getAs[Double]("dcg"); val idcg = r.getAs[Double]("idcg")
      val ndcg = r.getAs[Double]("ndcg")
      assert(idcg >= dcg - 1e-9, s"${r.get(0)}: DCG exceeds IDCG")
      assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9)
    }
  }

  test("emb_spearman_pq: rho bounded, full candidate set ranked") {
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    val rows = SparkEntry.queries("emb_spearman_pq")(spark, sf001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n - 1, "ranking must cover every non-self vector")
      val rho = r.getAs[Double]("spearman_rho")
      assert(rho >= -1.0 && rho <= 1.0)
      // PQ at 2×16 cells is a COARSE quantizer (256 composite codes):
      // measured rho on this corpus spans ~0.29–0.8, so the law floor
      // is 0.2 — low enough for honest coarseness, high enough that a
      // sign flip or shuffled ranking (rho ≈ 0) still fails
      assert(rho > 0.2, s"query ${r.get(0)}: rho $rho suspiciously low")
    }
  }

  test("pipe_neyman_allocation: the allocation spends the budget, never overspends") {
    val rows = SparkEntry.queries("pipe_neyman_allocation")(spark, sf01).collect()
    val tot = rows.map(_.getAs[Long]("neyman_n")).sum
    // floor division: <= 1000 and within one unit per stratum of it
    assert(tot <= 1000 && tot >= 1000 - rows.length,
      s"Neyman allocation sums to $tot over ${rows.length} strata")
    val ptot = rows.map(_.getAs[Long]("prop_n")).sum
    assert(ptot <= 1000 && ptot >= 1000 - rows.length)
  }

  test("pipe_filter_ablation: unique kills are a lower bound on fails") {
    val rows = SparkEntry.queries("pipe_filter_ablation")(spark, sf01).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unique_kills") <= r.getAs[Long]("n_fail"),
        s"${r.get(0)}: unique kills exceed total fails")
    }
  }

  test("emb_cka_halves: CKA is a normalized similarity in [0, 1]") {
    val r = SparkEntry.queries("emb_cka_halves")(spark, sf001).collect()
    assert(r.length == 1)
    val cka = r(0).getAs[Double]("cka_halves")
    assert(cka >= 0.0 && cka <= 1.0 + 1e-9, s"CKA $cka outside [0,1]")
  }

  test("pipe_weighted_sample: top-100 A-ES keys oversample long documents") {
    val rows = SparkEntry.queries("pipe_weighted_sample")(spark, sf01).collect()
    assert(rows.length == 100)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 100))
    // keys must be sorted (the rank IS the key order)
    val ks = rows.map(_.getAs[Double]("lnk"))
    ks.sliding(2).foreach(w => assert(w(0) >= w(1)))
    // length-proportional sampling must overselect long docs: the
    // sample's mean weight beats the corpus mean by a clear margin
    val corpusMean = spark.read.parquet(s"$sf01/documents.parquet")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = rows.map(_.getAs[Long]("weight")).sum.toDouble / 100
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("q_granger_daily: F and R2-gain are well-formed in both directions") {
    val rows = SparkEntry.queries("q_granger_daily")(spark, sf01).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val f = r.getAs[Double]("f_stat"); val g = r.getAs[Double]("r2_gain")
      assert(!f.isNaN && !f.isInfinite && f >= -1e-9)
      assert(g >= -1e-9 && g < 1.0, s"${r.get(0)}: r2_gain $g outside [0,1)")
      assert(r.getAs[Long]("n_days") >= 10)
    }
  }

  test("q_rolling_distinct_approx: KMV estimate is exact below k, bounded error above") {
    val rows = SparkEntry.queries("q_rolling_distinct_approx")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact"); val est = r.getAs[Long]("est")
      if (exact < 64) assert(est == exact,
        s"${r.get(0)}: sub-k window must be exact ($est vs $exact)")
      // KMV with k=64 has relative std error ~1/sqrt(62) ≈ 12.7%; a
      // 50% miss means the estimator (not the noise) is broken
      else assert(math.abs(est - exact).toDouble / exact < 0.5,
        s"${r.get(0)}: KMV est $est vs exact $exact")
    }
  }

  test("pipe_curriculum_pacing: competence and unlocked counts are monotone to full corpus") {
    val rows = SparkEntry.queries("pipe_curriculum_pacing")(spark, sf001).collect()
    assert(rows.length == 10)
    val n = spark.read.parquet(s"$sf001/documents.parquet").count()
    rows.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("competence_ppm") <= w(1).getAs[Long]("competence_ppm"))
      assert(w(0).getAs[Long]("n_unlocked") <= w(1).getAs[Long]("n_unlocked"))
    }
    assert(rows.last.getAs[Long]("competence_ppm") == 1000000L)
    assert(rows.last.getAs[Long]("n_unlocked") == n,
      "step 10 must unlock the whole corpus")
  }

  test("feat_kfold_target_encode: out-of-fold counts exclude exactly the own fold") {
    val rows = SparkEntry.queries("feat_kfold_target_encode")(spark, sf01).collect()
    assert(rows.length == 25)
    val tot = graft.sources.Tables.events(spark, sf01)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, cs) =>
      // each row's n_out = n_c - n_cf, so summing over the 5 folds
      // gives 5·n_c - n_c = 4·n_c
      assert(cs.map(_.getAs[Long]("n_out")).sum == 4 * tot(t),
        s"$t: out-of-fold counts don't tile the category")
    }
  }

  test("sim_topk_rptree: well-formed per-query rankings, deterministic across runs") {
    val q = SparkEntry.queries("sim_topk_rptree")
    val a = q(spark, sf001).collect()
    assert(a.nonEmpty)
    a.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"query $qid: ranks not contiguous")
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      sims.sliding(2).foreach(w => if (w.length == 2) assert(w(0) >= w(1)))
    }
    val b = q(spark, sf001).collect()
    assert(a.map(_.toString).toSeq == b.toSeq.map(_.toString),
      "median-split routing must be exactly reproducible")
  }

  test("q_sprt_sequential: decision agrees with the crossing days") {
    val r = SparkEntry.queries("q_sprt_sequential")(spark, sf01).collect()(0)
    assert(r.getAs[Long]("max_llr_micro") >= r.getAs[Long]("min_llr_micro"))
    val (h1, h0) = (r.getAs[String]("h1_day"), r.getAs[String]("h0_day"))
    val dec = r.getAs[String]("decision")
    if (dec == "continue") assert(h1 == "none" && h0 == "none")
    if (dec == "accept_h1") assert(h1 != "none")
    if (dec == "accept_h0") assert(h0 != "none" &&
      (h1 == "none" || h0 < h1))
  }

  test("q_kmv_setops: sketch estimates bracket the exact set algebra") {
    val r = SparkEntry.queries("q_kmv_setops")(spark, sf01).collect()(0)
    // union upper/lower structure: est_union <= est_a + est_b, and the
    // clamped intersection never goes negative
    assert(r.getAs[Long]("est_union") <=
      r.getAs[Long]("est_click") + r.getAs[Long]("est_purchase"))
    assert(r.getAs[Long]("est_intersect") >= 0L)
    // k=256 KMV: ~6% rse; 35% is the broken-estimator bar
    Seq(("est_click", "exact_click"), ("est_purchase", "exact_purchase"),
      ("est_union", "exact_union")).foreach { case (e, x) =>
      val est = r.getAs[Long](e); val exact = r.getAs[Long](x)
      assert(math.abs(est - exact).toDouble / exact < 0.35,
        s"$e=$est vs $x=$exact")
    }
  }

  test("corpus_lognormal_fit: KS distance is a valid sup-norm in [0,1]") {
    val r = SparkEntry.queries("corpus_lognormal_fit")(spark, sf01).collect()(0)
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(r.getAs[Double]("sigma") > 0.0)
    // documents lengths span ~50-550 chars → mu = E[ln len] must land
    // inside ln(48)..ln(553)
    val mu = r.getAs[Double]("mu")
    assert(mu > math.log(40) && mu < math.log(600))
  }

  test("text_burrows_delta: a proper distance over all source pairs") {
    val rows = SparkEntry.queries("text_burrows_delta")(spark, sf01).collect()
    // 20 sources -> 190 unordered pairs
    assert(rows.length == 190)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(r.getAs[Double]("delta") >= 0.0)
      assert(r.getAs[Long]("n_terms") <= 30L)
    }
  }

  test("q_graph_modularity: Q within Newman bounds and terms account every degree") {
    val r = SparkEntry.queries("q_graph_modularity")(spark, sf01).collect()(0)
    val q = r.getAs[Double]("q_modularity")
    assert(q >= -0.5 && q <= 1.0, s"modularity $q outside [-0.5, 1]")
    assert(r.getAs[Long]("n_edges") > 0 && r.getAs[Long]("n_communities") > 0)
  }

  test("q_group_sequential: OBF boundaries are monotone-tightening and z well-formed") {
    val rows = SparkEntry.queries("q_group_sequential")(spark, sf01).collect()
    assert(rows.length == 5)
    val bs = rows.sortBy(_.getAs[Long]("look")).map(_.getAs[Double]("boundary"))
    bs.sliding(2).foreach(w => assert(w(0) > w(1), "boundaries must shrink"))
    assert(math.abs(bs.last - 2.0403) < 1e-6)
    rows.foreach { r =>
      assert(!r.getAs[Double]("z").isNaN)
      assert(r.getAs[Boolean]("crossed") ==
        (math.abs(r.getAs[Double]("z")) >= r.getAs[Double]("boundary")))
    }
    // cumulative sample sizes must be nondecreasing across looks
    val ns = rows.sortBy(_.getAs[Long]("look")).map(_.getAs[Long]("n_a"))
    ns.sliding(2).foreach(w => assert(w(0) <= w(1)))
  }

  test("q_newsvendor_stock: the critical fractile actually covers >= 75% of days") {
    val r = SparkEntry.queries("q_newsvendor_stock")(spark, sf01).collect()(0)
    assert(r.getAs[Long]("service_ppm") >= 750000L,
      "stocking at the 0.75 fractile must serve at least 75% of days")
    assert(r.getAs[Long]("exp_under_milli") >= 0L)
    assert(r.getAs[Long]("exp_over_milli") >= 0L)
  }

  test("text_code_detect: prose corpus yields sane symbol rates, verdict consistent") {
    val rows = SparkEntry.queries("text_code_detect")(spark, sf001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("sym_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      val code = r.getAs[Boolean]("is_code")
      val expect = r.getAs[Long]("n_brace") * 1000 >= r.getAs[Long]("n_chars") * 5 ||
        r.getAs[Long]("n_semi") * 1000 >= r.getAs[Long]("n_chars") * 5 ||
        ppm >= 250000L
      assert(code == expect)
    }
  }

  test("q_eb_shrinkage: top performers shrink DOWN toward the grand mean") {
    val rows = SparkEntry.queries("q_eb_shrinkage")(spark, sf01).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_rate"); val eb = r.getAs[Double]("eb_rate")
      assert(eb > 0.0 && eb < 1.0)
      // the top-20 by shrunken rate are above the grand mean, so
      // shrinkage must pull every one of them toward it (never past raw)
      assert(eb <= raw + 1e-9,
        s"user ${r.get(0)}: eb $eb above raw $raw — shrinkage inverted")
    }
  }

  test("pipe_systematic_pps: exactly 100 grid hits, one per grid point") {
    val rows = SparkEntry.queries("pipe_systematic_pps")(spark, sf01).collect()
    // every one of the 100 equally-spaced grid points lands in exactly
    // one document's interval, so hit counts sum to 100 and a doc's
    // hits never exceed what its weight share could cover
    assert(rows.map(_.getAs[Long]("hits")).sum == 100L)
    rows.foreach(r => assert(r.getAs[Long]("hits") >= 1L))
    // plan law: the prefix sum must NOT ride a global window over raw
    // docs (two-phase bucket carry instead)
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = SparkEntry.queries("pipe_systematic_pps")(spark, sf001)
      .queryExecution.executedPlan
    plan.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        assert(w.child.exists(_.nodeName.contains("Aggregate")),
          "global window must ride the bounded bucket digest")
      case _ => ()
    }
  }

  test("q_ipf_raking: 8 iterations land the column margins, rows near-converged") {
    val rows = SparkEntry.queries("q_ipf_raking")(spark, sf01).collect()
    assert(rows.length == 35)
    // the final scaling pass is by column, so column sums match the
    // target exactly up to per-cell floor loss (< n_cells milli-units)
    rows.groupBy(_.getAs[Int]("dow")).foreach { case (_, cs) =>
      val fitted = cs.map(_.getAs[Long]("fitted_milli")).sum
      val target = cs.head.getAs[Long]("col_target") * 1000L
      assert(math.abs(fitted - target) <= cs.length * 1000L,
        s"column margin off by ${fitted - target} milli")
    }
    // row margins converge to within 1% after 8 alternations
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (e, cs) =>
      val fitted = cs.map(_.getAs[Long]("fitted_milli")).sum
      val target = cs.head.getAs[Long]("row_target") * 1000L
      assert(math.abs(fitted - target).toDouble / target < 0.01,
        s"$e: row margin off by ${(fitted - target).toDouble / target}")
    }
  }
}
