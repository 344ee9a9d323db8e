package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance op every long-lived
  * 100 TB dataset needs. Streaming ingests and fine-grained partitioned
  * writes leave thousands of tiny part files; each one costs a task,
  * a file-open and a footer read per query, so scan overhead grows with
  * file COUNT while useful work grows with bytes. Compaction rewrites
  * the data into size-targeted files: output file count is derived from
  * the actual on-disk bytes, not guessed.
  *
  * The rewrite is one `repartition(nOut)` — a single round-robin
  * shuffle that also redistributes skewed input files evenly. At scale
  * this runs per-partition (compact yesterday's partition, not the
  * whole table), composing with the hive layout `io_partitioned_prune`
  * demonstrates.
  */
object Compaction {

  /** Data part files of a parquet directory (ignores _SUCCESS/CRCs). */
  def partFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Rewrite `inDir` into `outDir` targeting `targetBytes` per file.
    * Returns (files before, files after). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "target file size must be positive")
    val before = partFiles(spark, inDir)
    val totalBytes = before.map(_._2).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    (before.size, partFiles(spark, outDir).size)
  }
}
