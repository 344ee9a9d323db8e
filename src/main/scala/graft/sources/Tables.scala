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

  /** events with `ts` as a proper us-precision TimestampType.
    *
    * The DataFrame (the analyzed plan + file index, NOT the data) is
    * memoized per (session, dir): ~10 queries read this table, and
    * rebuilding it re-lists the directory and re-reads parquet footers
    * for schema inference each time. Plan reuse is free; the scan
    * itself still streams per query — nothing is persisted. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsCache.getOrElseUpdate((System.identityHashCode(spark), dir), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    })

  private val eventsCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  /** Exact row count from the parquet footer (no scan) — the count(*)
    * fast path every columnar engine uses for a whole-table count. */
  def footerRowCount(spark: SparkSession, dir: String, name: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val conf = spark.sessionState.newHadoopConf()
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, path, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    footer.getBlocks.asScala.map(_.getRowCount).sum
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
}
