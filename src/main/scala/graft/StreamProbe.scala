package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY probe: per-phase timing of one stream-join run. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val streamCpBase =
      graft.streaming.StreamingEtl.scratchDir("graft_probe_cp")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation", streamCpBase.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the micro-batch machinery
    SparkEntry.queries("q_stream_tumbling")(spark, sfDir).write
      .mode("overwrite").format("noop").save()

    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"[probe] batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          s"durations=${e.progress.durationMs}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    for (parts <- Seq("8", "4", "2")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      for (q <- Seq("q_stream_join", "q_stream_join_outer")) {
        for (trial <- 1 to 2) {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir).write
            .mode("overwrite").format("noop").save()
          println(f"[probe] parts=$parts $q trial$trial total=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    for (trial <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_stream_join")(spark, sfDir).write
        .mode("overwrite").format("noop").save()
      println(f"[probe] noDataOff q_stream_join trial$trial total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
