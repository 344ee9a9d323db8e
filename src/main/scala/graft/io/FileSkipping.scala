package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min/max file skipping over a range-clustered layout — the zone-map
  * / Delta-file-statistics pattern, built from plain parquet + a stats
  * index table.
  *
  * Two pieces:
  *  1. a layout clustered on the skip key (`repartitionByRange` +
  *     `sortWithinPartitions`), so each file covers a narrow key
  *     range — the 1-D case of Z-ordering;
  *  2. a stats INDEX (one row per file: min/max of the key), computed
  *     in one distributed pass via the `_metadata.file_path` column
  *     and stored as parquet next to the data.
  *
  * A point/range query then consults the index first and reads ONLY
  * the overlapping files. On this layout a 100-user probe of a
  * 1500-user table opens ~1/15th of the files; at 100 TB that is the
  * difference between a full scan and reading one executor's worth of
  * input. The residual filter still applies after the pruned read, so
  * results are exact regardless of index granularity.
  *
  * (Parquet row-group stats give a similar skip WITHIN a file once it
  * is opened; the file-level index avoids opening the file at all —
  * exactly what lakehouse table formats store in their metadata
  * layer.)
  */
object FileSkipping {

  /** Build (or reuse) the clustered layout + stats index for `events`
    * keyed by `user_id`. Returns (dataDir, indexPath). */
  def ensureEventsByUser(spark: SparkSession, sfDir: String,
                         nFiles: Int = 16): (String, String) =
    cache.getOrElseUpdate((System.identityHashCode(spark), sfDir), {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_skip_ev_${math.abs(sfDir.hashCode)}"
      val dataDir = s"$base/data"; val idxPath = s"$base/index"
      graft.sources.Tables.events(spark, sfDir)
        .repartitionByRange(nFiles, col("user_id"))
        .sortWithinPartitions(col("user_id"))
        .write.mode("overwrite").parquet(dataDir)
      spark.read.parquet(dataDir)
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(min(col("user_id")).as("key_lo"), max(col("user_id")).as("key_hi"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(idxPath)
      (dataDir, idxPath)
    })

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), (String, String)]

  /** All files vs files whose [key_lo, key_hi] overlaps [lo, hi] — the
    * planning-time index consultation (the index is one tiny row per
    * file; collecting it is what a catalog lookup is). */
  def planFiles(spark: SparkSession, idxPath: String,
                lo: Long, hi: Long): (Seq[String], Int) = {
    val idx = spark.read.parquet(idxPath)
    val total = idx.count().toInt
    val kept = idx.filter(col("key_hi") >= lo && col("key_lo") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq
    (kept, total)
  }

  /** Pruned read: only overlapping files are opened; the residual
    * predicate still applies (exactness does not depend on the index). */
  def prunedRead(spark: SparkSession, sfDir: String,
                 lo: Long, hi: Long): DataFrame = {
    val (_, idxPath) = ensureEventsByUser(spark, sfDir)
    val (files, _) = planFiles(spark, idxPath, lo, hi)
    if (files.isEmpty)
      graft.sources.Tables.events(spark, sfDir)
        .filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col("user_id").between(lo, hi))
  }
}
