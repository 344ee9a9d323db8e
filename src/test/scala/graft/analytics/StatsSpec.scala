package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Pins A2-A5 semantics: pandas-type-7 linear interpolation quantiles,
  * pairwise-complete Pearson corr with zero-variance undefinedness,
  * and the exact-decimal describe() summary. */
class StatsSpec extends GraftSpec {

  test("quantiles use linear interpolation (pandas type-7 / quantile_cont)") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Stats.quantiles(df, "x", Seq(0.25, 0.5, 0.75)).head()
    assert(r.getDouble(0) === 1.75 +- 1e-12)
    assert(r.getDouble(1) === 2.5 +- 1e-12)
    assert(r.getDouble(2) === 3.25 +- 1e-12)
  }

  test("corrMatrix: zero-variance column yields undefined (null/NaN), correlated pair exact") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 7.0), (2.0, 4.0, 7.0), (3.0, 6.0, 7.0))
      .toDF("a", "b", "c")
    val out = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(out(("a", "b")) === 1.0 +- 1e-12)
    assert(out(("a", "c")).isNaN, "const column -> undefined corr (app.py:423)")
    assert(out.size === 3)
  }

  test("corr is pairwise-complete: null rows drop from that pair only") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(10.0)), (Some(2.0), Some(20.0)),
      (Some(3.0), None: Option[Double]), (Some(4.0), Some(40.0))
    ).toDF("a", "b")
    val r = Stats.corrMatrix(df, Seq("a", "b")).head()
    assert(r.getDouble(2) === 1.0 +- 1e-12)
  }

  test("summaryExact matches hand-computed stats on [1..5]") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    val r = Stats.summaryExact(df, "x").head()
    assert(r.getLong(0) === 5L)
    assert(r.getDouble(1) === 3.0 +- 1e-12)                    // mean
    assert(r.getDouble(2) === math.sqrt(2.5) +- 1e-12)         // sample stddev
    assert(r.getDouble(3) === 1.0)                             // min
    assert(r.getDouble(4) === 5.0)                             // max
    assert(r.getDouble(5) === 2.0 +- 1e-12)                    // q25
    assert(r.getDouble(6) === 3.0 +- 1e-12)                    // q50
    assert(r.getDouble(7) === 4.0 +- 1e-12)                    // q75
  }

  test("approx_percentile tracks the exact percentiles (the 100 TB switch)") {
    import spark.implicits._
    // 10k distinct values: with accuracy 10000 the sketch is near-exact
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val approx = df.agg(org.apache.spark.sql.functions
        .expr("approx_percentile(v, array(0.25, 0.5, 0.75), 10000)"))
      .head().getSeq[Double](0)
    val exact = Stats.quantiles(df, "v", Seq(0.25, 0.5, 0.75))
      .head().toSeq.map(_.asInstanceOf[Double])
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= e * 0.01, s"approx $a vs exact $e")
    }
  }

  test("approx_count_distinct tracks the exact distinct count (HLL law)") {
    import spark.implicits._
    // 5k distinct keys with duplicates: rsd=0.02 must land within 5%
    val df = (1 to 20000).map(i => i % 5000).toDF("k")
    val approx = df.agg(org.apache.spark.sql.functions
      .approx_count_distinct(org.apache.spark.sql.functions.col("k"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - 5000L) <= 250L,
      s"HLL estimate $approx drifted >5% from exact 5000")
  }

  test("tsExtremes returns min/max of a timestamp column") {
    val df = tsDf("ts", Seq(5000000L, 1000000L, 9000000L))
    val r = Stats.tsExtremes(df, "ts").head()
    assert(r.getTimestamp(0).getTime === 1000L)
    assert(r.getTimestamp(1).getTime === 9000L)
  }

  test("quantilesBySort agrees exactly with the buffered aggregate") {
    import spark.implicits._
    // deterministic irregular values over 8 partitions, incl. dupes
    val xs = (0 until 10001).map(i => ((i * 7919) % 10007) * 0.5)
    val df = xs.toDF("x").repartition(8)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val buffered = Stats.quantiles(df, "x", qs).head()
    val sorted = Stats.quantilesBySort(df, "x", qs).head()
    qs.indices.foreach { i =>
      assert(sorted.getDouble(i) === buffered.getDouble(i),
        s"q=${qs(i)}: sort-path ${sorted.getDouble(i)} != buffered ${buffered.getDouble(i)}")
    }
  }

  test("equi-depth bucketing on exact deciles balances bucket sizes") {
    val fn = graft.SparkEntry.queries("q_equidepth_bins")
    val rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 10)
    val counts = rows.map(_.getAs[Long]("n"))
    val total = counts.sum
    // each decile bucket holds 10% ± ties (values are continuous ->
    // essentially exact); allow 2% slack for duplicate boundary values
    counts.foreach(c =>
      assert(math.abs(c - total / 10.0) <= total * 0.02, counts.mkString(",")))
    // buckets are ordered and contiguous: max of bucket k <= min of k+1
    val byBucket = rows.sortBy(_.getAs[Int]("bucket"))
    byBucket.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_v") <= b.getAs[Double]("min_v") + 1e-9)
    }
  }
}
