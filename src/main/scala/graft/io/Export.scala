package graft.io

import org.apache.spark.sql.DataFrame

/** K1 — CSV export (`/root/reference/app.py:441-451`).
  *
  * The reference serializes the synchronized table into one in-memory
  * CSV buffer. The distributed analogue writes header CSV part files;
  * `singleFile=true` coalesces to one part (only sane for small,
  * user-facing exports — at 100 TB keep the parallel writer and let
  * the consumer read the directory).
  */
object Export {
  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
