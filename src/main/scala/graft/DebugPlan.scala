package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: execute a query and print the FINAL adaptive
  * plan (post-execution, reuse decisions visible). */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_WSCG", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = sys.env.getOrElse("SPARK_GRAFT_DEBUG_REPS", "1").toInt
    var df = SparkEntry.queries(name)(spark, sfDir)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      println(f"[debugplan] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (sys.env.contains("SPARK_GRAFT_DEBUG_PLAN"))
      println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
