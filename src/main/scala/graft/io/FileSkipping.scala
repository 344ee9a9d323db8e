package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * Layouts PERSIST across sessions: dirs are keyed by an md5 of the
  * source path plus a layout-version tag, and a completed build is
  * recognized by its `_SUCCESS` markers — a new JVM reuses the
  * on-disk layout instead of rebuilding it (the lakehouse behavior:
  * table maintenance is durable, not session state). Bumping the
  * version tag invalidates old layouts when the algorithm changes.
  */
object FileSkipping {

  /** Collision-proof, filesystem-safe dir key for a source path (the
    * old `math.abs(path.hashCode)` idiom could collide two dirs — and
    * abs(Int.MinValue) is negative). The version tag busts stale
    * layouts built by older algorithm revisions, and the key also
    * folds in a fingerprint of the source dir's parquet files
    * (name+size+mtime), so a REGENERATED dataset at the same path
    * invalidates every persisted artifact on the next session —
    * serving a layout built from a previous generation of the data
    * would be silently wrong. Deliberately conservative: the
    * fingerprint covers ALL parquet in the dir, so regenerating an
    * unrelated table also rebuilds events-derived artifacts (a cheap
    * false positive; a stale-serve false negative is the one that
    * corrupts results). */
  private[graft] def pathKey(sfDir: String, version: String): String = {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    // two segments: <dataset>_<generation>. The first hashes the
    // source PATH alone and is stable across regenerations; it is part
    // of the GC prefix (gcStaleSiblings keeps everything up to the
    // last '_'), so rebuilding sf0.1's layout can only collect stale
    // GENERATIONS of sf0.1 — never another dataset's live artifacts.
    val dataset = md5(sfDir).take(8)
    val generation = md5(s"$sfDir|${dirFingerprint(sfDir)}|$version").take(16)
    s"${dataset}_$generation"
  }

  /** name:size:mtime of each parquet entry directly under `sfDir` —
    * the cheap content proxy (a real checksum would need a full scan).
    * Listed through the Hadoop FileSystem API so it works on any
    * scheme Spark can read (HDFS/S3/local), and directory-style
    * parquet tables (a Spark write is a DIRECTORY of part files) are
    * fingerprinted by their name + aggregate child size + max child
    * mtime rather than skipped.
    *
    * Memoized per (dir) for the JVM lifetime: data regenerated UNDER a
    * live JVM is not re-detected until restart — acceptable because a
    * dataset swap while queries are mid-flight is undefined behavior
    * for any engine; the guarantee here is cross-SESSION freshness. */
  private val fpCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def dirFingerprint(sfDir: String): String =
    fpCache.getOrElseUpdate(sfDir, {
      val path = new org.apache.hadoop.fs.Path(sfDir)
      val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val entries =
        try fs.listStatus(path).toSeq
        catch { case _: java.io.IOException => Seq.empty }
      entries.filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
        .map { st =>
          if (st.isDirectory) {
            val kids = try fs.listStatus(st.getPath).toSeq
                       catch { case _: java.io.IOException => Seq.empty }
            val sz = kids.map(_.getLen).sum
            val mt = (st.getModificationTime +: kids.map(_.getModificationTime)).max
            s"${st.getPath.getName}:d$sz:$mt"
          } else
            s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
        }
        .mkString(",")
    })

  /** Fingerprint-keyed dirs churn on every data regeneration; the
    * previous generation's layout dirs would otherwise accumulate in
    * tmpdir forever. Called right before a fresh build: removes
    * sibling dirs with the same artifact prefix — which INCLUDES the
    * dataset segment of pathKey, so only stale generations of the
    * SAME dataset are collected, never another dataset's live
    * artifacts — but a different generation key (never the one about
    * to be (re)used). */
  private def gcStaleSiblings(base: String): Unit = {
    val dir = new java.io.File(base).getParentFile
    val name = new java.io.File(base).getName
    val prefix = name.substring(0, name.lastIndexOf('_') + 1)
    val keep = name
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix) &&
        f.getName != keep)
      .foreach { f =>
        try {
          java.nio.file.Files.walk(f.toPath)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: java.io.IOException => () }
      }
  }

  /** A finished Spark parquet write leaves a `_SUCCESS` marker; its
    * presence in both dirs means a prior session already built this
    * layout and it can be reused as-is. */
  private def built(dirs: String*): Boolean =
    dirs.forall(d => new java.io.File(d, "_SUCCESS").isFile)

  /** Build (or reuse) the clustered layout + stats index for `events`
    * keyed by `user_id`. Returns (dataDir, indexPath). */
  def ensureEventsByUser(spark: SparkSession, sfDir: String,
                         nFiles: Int = 16): (String, String) =
    cache.getOrElseUpdate(sfDir, {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_skip_ev_${pathKey(sfDir, "v1")}"
      val dataDir = s"$base/data"; val idxPath = s"$base/index"
      if (!built(dataDir, idxPath)) {
        gcStaleSiblings(base)
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
      }
      (dataDir, idxPath)
    })

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** All files vs files whose [key_lo, key_hi] overlaps [lo, hi] — the
    * planning-time index consultation (the index is one tiny row per
    * file; collecting it ONCE is what a catalog lookup is — total and
    * kept both come from that single read). */
  def planFiles(spark: SparkSession, idxPath: String,
                lo: Long, hi: Long): (Seq[String], Int) = {
    val rows = spark.read.parquet(idxPath)
      .select(col("file"), col("key_lo"), col("key_hi")).collect()
    val kept = rows.toSeq
      .filter(r => r.getLong(2) >= lo && r.getLong(1) <= hi)
      .map(_.getString(0))
    (kept, rows.length)
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

  // ---------------------------------------------------------------
  // Z-order (2-D) clustering — the multi-dimensional generalization
  // of the range-clustered layout above: interleaving the bits of two
  // keys makes each file cover a small RECTANGLE in (k1, k2) space,
  // so a predicate on EITHER dimension (or both) skips files. A
  // 1-D sort would cluster only its leading key; the trailing key's
  // min/max spans everything and never prunes.
  // ---------------------------------------------------------------

  /** Morton/Z-value of two 16-bit keys via the parallel-bit-spread
    * closed form (4 mask-shift rounds per key) — pure bitwise column
    * arithmetic, stays inside whole-stage codegen. Inputs are clamped
    * to [0, 65535]; callers quantize wider domains into 16-bit codes
    * first (`quantize16`) so high keys don't all collapse into one
    * z-cell (the z-value only drives clustering, exactness never
    * depends on it). */
  def morton16(a: Column, b: Column): Column = {
    def spread(x0: Column): Column = {
      val c = x0.cast("long")
      val x = least(greatest(c, lit(0L)), lit(65535L))
      val s1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Linear map of `k` from its OBSERVED [lo, hi] range onto the
    * 16-bit morton grid (width-bucket style). Without this, any key
    * domain wider than 65535 would clamp: all high keys share one
    * z-cell and 2-D pruning silently degenerates at larger scale
    * factors. */
  def quantize16(k: Column, lo: Long, hi: Long): Column = {
    val span = math.max(1L, hi - lo)
    // (k-lo)·65535 stays exactly representable for spans < 2^37 — far
    // beyond any key domain here; floor keeps the code in [0, 65535]
    floor((k.cast("long") - lit(lo)).cast("double") * lit(65535.0) / lit(span.toDouble))
      .cast("long")
  }

  /** Build (or reuse) the Z-ordered layout of `events` on
    * (user_id, floor(value)) plus a per-file 2-D stats index
    * (min/max of BOTH keys). Both keys are quantized into 16-bit
    * codes from their observed min/max (one tiny agg job) before
    * bit-interleaving. Returns (dataDir, indexPath). */
  def ensureEventsZOrder(spark: SparkSession, sfDir: String,
                         nFiles: Int = 32): (String, String) =
    zcache.getOrElseUpdate(sfDir, {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_ev_${pathKey(sfDir, "v2")}"
      val dataDir = s"$base/data"; val idxPath = s"$base/index"
      if (!built(dataDir, idxPath)) {
        gcStaleSiblings(base)
        val ev = graft.sources.Tables.events(spark, sfDir)
        val b = ev.agg(
          min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
          min(floor(col("value")).cast("long")).as("vlo"),
          max(floor(col("value")).cast("long")).as("vhi")).head()
        ev.withColumn("__z", morton16(
            quantize16(col("user_id"), b.getLong(0), b.getLong(1)),
            quantize16(floor(col("value")).cast("long"), b.getLong(2), b.getLong(3))))
          .repartitionByRange(nFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
          .write.mode("overwrite").parquet(dataDir)
        spark.read.parquet(dataDir)
          .groupBy(col("_metadata.file_path").as("file"))
          .agg(min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
            min(floor(col("value")).cast("long")).as("v_lo"),
            max(floor(col("value")).cast("long")).as("v_hi"),
            count(lit(1)).as("n_rows"))
          .coalesce(1)
          .write.mode("overwrite").parquet(idxPath)
      }
      (dataDir, idxPath)
    })

  private val zcache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Files whose (user, value) bounding rectangle intersects the query
    * box — 2-D index consultation, one read of the 1-file index. */
  def planFiles2D(spark: SparkSession, idxPath: String,
                  uLo: Long, uHi: Long, vLo: Long, vHi: Long): (Seq[String], Int) = {
    val rows = spark.read.parquet(idxPath)
      .select(col("file"), col("u_lo"), col("u_hi"), col("v_lo"), col("v_hi"))
      .collect()
    val kept = rows.toSeq
      .filter(r => r.getLong(2) >= uLo && r.getLong(1) <= uHi &&
        r.getLong(4) >= vLo && r.getLong(3) <= vHi)
      .map(_.getString(0))
    (kept, rows.length)
  }

  /** 2-D pruned read over the Z-ordered layout; the residual predicate
    * keeps results exact regardless of index granularity. */
  def prunedRead2D(spark: SparkSession, sfDir: String,
                   uLo: Long, uHi: Long, vLo: Double, vHi: Double): DataFrame = {
    val (_, idxPath) = ensureEventsZOrder(spark, sfDir)
    val (files, _) = planFiles2D(spark, idxPath, uLo, uHi,
      math.floor(vLo).toLong, math.floor(vHi).toLong)
    val residual = col("user_id").between(uLo, uHi) &&
      col("value") >= vLo && col("value") < vHi
    if (files.isEmpty)
      graft.sources.Tables.events(spark, sfDir).filter(lit(false))
    else spark.read.parquet(files: _*).filter(residual)
  }
}
