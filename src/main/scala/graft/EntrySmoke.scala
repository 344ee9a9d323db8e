package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's smoke check: SparkEntry.entry must
  * return >0 rows on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_SCHEMA=" + df.schema.map(_.name).mkString(","))
    println("ENTRY_ROWS=" + df.count())
    spark.stop()
  }
}
