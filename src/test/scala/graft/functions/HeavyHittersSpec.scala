package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Misra-Gries laws — the sketch is useless unless its guarantee
  * actually holds under Spark's partial/merge execution, so the laws
  * are asserted against exact counts on a skewed multi-partition
  * input. */
class HeavyHittersSpec extends GraftSpec {

  // Zipf-ish skew: term t_i appears ~1000/i times, i in 1..200,
  // shuffled and spread over 8 partitions so partials genuinely merge.
  private lazy val terms: Seq[String] = {
    val raw = for {
      i <- 1 to 200
      _ <- 1 to (1000 / i)
    } yield s"t$i"
    new scala.util.Random(42).shuffle(raw)
  }

  test("MG guarantee: all >N/(k+1) terms present, bounds within N/(k+1)") {
    import spark.implicits._
    val k = 16
    val df = terms.toDF("term").repartition(8)
    val n = terms.size.toLong
    val exact = terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val sketch = df.agg(HeavyHitters.heavyHitters(col("term"), k))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val eps = n / (k + 1L)
    // completeness: every true heavy hitter survives the merges
    exact.filter(_._2 > eps).foreach { case (t, c) =>
      assert(sketch.contains(t), s"lost heavy hitter $t (true count $c, eps $eps)")
    }
    // soundness: reported counts are lower bounds, within eps of truth
    sketch.foreach { case (t, lb) =>
      val c = exact.getOrElse(t, 0L)
      assert(lb <= c, s"$t: lower bound $lb exceeds true count $c")
      assert(c - lb <= eps, s"$t: bound gap ${c - lb} > eps $eps")
    }
    assert(sketch.size <= k)
  }

  test("state stays O(k): serialized partial is tiny on wide input") {
    val buf = new MGBuf(8)
    (1 to 100000).foreach(i => buf.add(s"term$i", 1L))
    assert(buf.counts.size() <= 8)
  }

  test("merge matches streaming the concatenation (guarantee preserved)") {
    val k = 8
    val a = new MGBuf(k); val b = new MGBuf(k)
    val xs = (1 to 500).map(i => s"x${i % 23}")
    val ys = (1 to 500).map(i => s"x${i % 7}")
    xs.foreach(a.add(_, 1L)); ys.foreach(b.add(_, 1L))
    a.merge(b)
    val exact = (xs ++ ys).groupBy(identity).view.mapValues(_.size.toLong)
    val eps = (xs.size + ys.size) / (k + 1L)
    exact.filter(_._2 > eps).foreach { case (t, _) =>
      assert(a.counts.containsKey(t), s"merge lost heavy hitter $t")
    }
    a.counts.forEach { (t, lb) =>
      val c = exact.getOrElse(t, 0L)
      assert(lb <= c && c - lb <= eps, s"$t: lb=$lb true=$c eps=$eps")
    }
  }
}
