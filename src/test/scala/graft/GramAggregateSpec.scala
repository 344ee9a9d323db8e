package graft

import org.apache.spark.sql.functions._

/** Laws for the exact Gram TypedImperativeAggregate: equality with
  * brute-force sums, and partition-layout independence (the property
  * that makes its consumers oracle-safe, unlike the sketch aggregates).
  */
class GramAggregateSpec extends GraftSpec {

  private def gramOf(parts: Int) = {
    import spark.implicits._
    val rows = Seq(
      Array(1L, 2L, 3L), Array(-4L, 0L, 5L), Array(7L, -1L, 2L),
      Array(0L, 0L, 0L), Array(3L, 3L, -3L))
    rows.toDF("v").repartition(parts)
      .agg(graft.functions.GramAggregate.gram(col("v"), 3).as("g"))
      .select(col("g.n"), col("g.s"), col("g.p")).collect()(0)
  }

  test("gram equals brute-force moments") {
    val r = gramOf(1)
    val vs = Seq(Seq(1L, 2L, 3L), Seq(-4L, 0L, 5L), Seq(7L, -1L, 2L),
      Seq(0L, 0L, 0L), Seq(3L, 3L, -3L))
    assert(r.getAs[Long]("n") == 5L)
    val s = r.getSeq[Long](1)
    assert(s == (0 until 3).map(i => vs.map(_(i)).sum))
    val p = r.getSeq[Long](2)
    val expected = for { i <- 0 until 3; j <- i until 3 }
      yield vs.map(v => v(i) * v(j)).sum
    assert(p == expected)
  }

  test("gram is partition-layout independent") {
    val a = gramOf(1); val b = gramOf(4)
    assert(a.getAs[Long]("n") == b.getAs[Long]("n"))
    assert(a.getSeq[Long](1) == b.getSeq[Long](1))
    assert(a.getSeq[Long](2) == b.getSeq[Long](2))
  }

  test("gram rejects wrong-width vectors loudly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Array(1L, 2L)).toDF("v")
        .agg(graft.functions.GramAggregate.gram(col("v"), 3)).collect()
    }
    assert(ex.getMessage.contains("expected a 3-dim vector") ||
      Option(ex.getCause).exists(_.getMessage.contains("expected a 3-dim vector")))
  }
}
