package graft

import org.apache.spark.sql.SparkSession

/** Local diagnosis aid (not part of the driver contract): run one
  * streaming scenario against a dir and print every micro-batch's
  * durationMs + state-operator customMetrics, so the stateful stage's
  * wall can be attributed (shuffle vs state commit vs sink). */
object StreamDebug {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = args(1)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER",
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          println("[progress] " + e.progress.json)
        }
      })
    val t0 = System.nanoTime()
    val df = which match {
      case "dedup" => graft.streaming.StreamingEtl.dedupViaStream(spark, dir)
      case "sessionize" =>
        graft.streaming.StreamingEtl.sessionizeViaStream(spark, dir).toDF()
    }
    df.write.mode("overwrite").format("noop").save()
    println(f"[wall] ${(System.nanoTime() - t0) / 1e9}%.2f s (incl staging)")
    // second run: staging warm, the honest per-trial cost
    val t1 = System.nanoTime()
    val df2 = which match {
      case "dedup" => graft.streaming.StreamingEtl.dedupViaStream(spark, dir)
      case "sessionize" =>
        graft.streaming.StreamingEtl.sessionizeViaStream(spark, dir).toDF()
    }
    df2.write.mode("overwrite").format("noop").save()
    println(f"[wall2] ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
