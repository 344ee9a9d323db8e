package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S4 — CSV ingest (`/root/reference/app.py:223-236`).
  *
  * The reference does bare `pd.read_csv` with inferred dtypes and leaves
  * `timestamp` as a string until sync coerces it (`app.py:149-150`).
  * We read with an explicit schema (deterministic, prunable); the
  * `timestamp` coercion is exposed separately so the pipeline can defer
  * it exactly like the reference does (Y2).
  */
object CsvIngest {

  /** Read a sensor CSV with an explicit schema (timestamp parsed up
    * front — the deterministic path; preferred). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Reference-faithful path: schema inferred, timestamp arrives as
    * whatever the file says (`app.py:225`). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Y2 — `pd.to_datetime` equivalent (`app.py:149-150,180`). */
  def coerceTimestamp(df: DataFrame, column: String = "timestamp"): DataFrame =
    df.withColumn(column, to_timestamp(col(column)))
}
