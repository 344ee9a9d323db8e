package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the distributed-rank primitives: they must agree EXACTLY
  * with the single-task window functions they replace, on every edge
  * (ties in the value column, n % k != 0, n < k, descending specs). */
class RanksSpec extends GraftSpec {

  private def sample(n: Int) = {
    import spark.implicits._
    // deliberate heavy ties in v — only (v, id) is tie-free
    (0 until n).map(i => ((i * 37 + 11) % 10).toLong -> i.toLong)
      .toDF("v", "id").repartition(7)
  }

  test("withGlobalRank equals row_number over the same tie-free order") {
    val df = sample(501)
    val viaHelper = Ranks.withGlobalRank(df, "rk",
      Seq("v" -> false, "id" -> false))
      .select("v", "id", "rk")
    val viaWindow = df.withColumn("rk",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    assert(viaHelper.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHelper).isEmpty)
  }

  test("withNtile equals ntile() for every k, direction, and ragged n") {
    for (n <- Seq(501, 500, 7, 3); k <- Seq(10, 5, 4)) {
      val df = sample(n)
      for (desc <- Seq(true, false)) {
        val spec = Seq("v" -> desc, "id" -> false)
        val viaHelper = Ranks.withNtile(df, k, "b", spec).select("v", "id", "b")
        val w = if (desc) Window.orderBy(col("v").desc, col("id"))
                else Window.orderBy(col("v"), col("id"))
        val viaWindow = df.withColumn("b", ntile(k).over(w))
        assert(viaHelper.exceptAll(viaWindow).isEmpty &&
          viaWindow.exceptAll(viaHelper).isEmpty,
          s"ntile mismatch at n=$n k=$k desc=$desc")
      }
    }
  }

  test("boundaryRanks covers ntile bucket sizes incl. n < k") {
    assert(Ranks.boundaryRanks(10, 5) == Seq(2, 4, 6, 8))
    assert(Ranks.boundaryRanks(12, 5) == Seq(3, 6, 8, 10))   // 3,3,2,2,2
    assert(Ranks.boundaryRanks(3, 5) == Seq(1, 2, 3, 3))     // 1,1,1,0,0
  }

  test("the assigning plan is shuffle- and window-free") {
    val df = sample(100)
    val spec = Seq("v" -> true, "id" -> false)
    val b = Ranks.ntileBoundaries(df, 5, spec)
    val plan = df.withColumn("b", Ranks.ntileColumn(b, spec))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert(!plan.contains("Exchange") || !plan.contains("rangepartitioning"),
      s"no global sort expected:\n$plan")
  }
}
