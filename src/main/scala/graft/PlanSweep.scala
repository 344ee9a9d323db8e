package graft

import org.apache.spark.sql.SparkSession

/** Whole-suite physical-plan audit: plans (does not execute) every
  * registered query and reports scale smells — CartesianProduct,
  * BroadcastNestedLoopJoin, and single-partition Window/Sort on
  * potentially-large inputs. Most BNLJ hits are legitimate 1-row
  * digest broadcasts (crossJoin(broadcast(agg))) — the report is for
  * human review, not a hard gate; PlanLawsSpec pins the hard laws.
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var planned = 0
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // streaming/stateful runs EXECUTE on construction — skip them
      // here (their plans are graded by their specs)
      if (!name.startsWith("q_stream") && !name.startsWith("mm_")) {
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          planned += 1
          val smells = Seq(
            "CartesianProduct" -> "CARTESIAN",
            "BroadcastNestedLoopJoin" -> "BNLJ").collect {
            case (pat, tag) if plan.contains(pat) =>
              s"$tag x${pat.r.findAllIn(plan).size}"
          }
          if (smells.nonEmpty) println(s"[plansweep] $name: ${smells.mkString(", ")}")
        } catch {
          case e: Throwable =>
            failed += 1
            println(s"[plansweep] $name PLAN-FAILED: ${e.getMessage.take(120)}")
        }
      }
    }
    println(s"[plansweep] done: $planned planned, $failed failed")
    spark.stop()
  }
}
