package graft
import org.apache.spark.sql.SparkSession
object JobCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      })
    for (q <- args.drop(1)) {
      // warm
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      jobs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      val w = (System.nanoTime()-t0)/1e9
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      println(f"[jobcount] $q jobs=${jobs.get()} wall=$w%.2f s")
    }
    spark.stop()
  }
}
