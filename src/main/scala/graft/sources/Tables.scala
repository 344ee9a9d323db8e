package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver's parquet tables.
  *
  * `events.parquet` is written with parquet TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects outright. We read the column as
  * raw nanos (`spark.sql.legacy.parquet.nanosAsLong`) and floor-divide
  * to microseconds — exactly what DuckDB does implicitly when it reads
  * the same file as its us-precision TIMESTAMP — so both engines see
  * bit-identical timestamps.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as a proper us-precision TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
