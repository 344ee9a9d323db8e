package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of any registered
  * query (`runMain graft.Explain <sfDir> <name> [<name>...]`) — for
  * checking pushdown (`PushedFilters`), scan pruning (`ReadSchema`),
  * join strategies, and whole-stage-codegen coverage per query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"[explain] $name failed: ${e.getMessage}") }
        case None => println(s"[explain] unknown query: $name")
      }
    }
    spark.stop()
  }
}
