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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
