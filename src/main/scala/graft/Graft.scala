package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by the engine, Verify, Bench and tests.
  *
  * Design point: local[32] here, but every operator is written for a
  * multi-executor cluster — partition-parallel generation, bucketed
  * as-of windows (no global single-partition sort), broadcast of
  * small dimensions, AQE left on.
  */
object Graft {

  /** Build a session with scale-appropriate defaults. */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one of the driver's parquet tables (TESTDATA.md); handles
    * the events table's TIMESTAMP(NANOS) encoding. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    sources.Tables.load(spark, sfDir, name)
}
