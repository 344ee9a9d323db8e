package graft.multimodal

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing with REAL codecs: PNG/WAV round-trips through
  * the distributed decode path, deterministic synthetic media, and
  * the thumbnail-embedding near-dup. */
class MultimodalSpec extends GraftSpec {

  test("PNG round-trip: decode recovers dimensions and exact pixel means") {
    val bytes = MediaKernels.makePng(seed = 7, w = 24, h = 16)
    val (w, h) = MediaKernels.imageMeta(bytes)
    assert((w, h) === ((24, 16)))
    // PNG is lossless -> means are exact and deterministic per seed
    val (r, g, b) = MediaKernels.channelMeans(bytes)
    val (r2, g2, b2) = MediaKernels.channelMeans(MediaKernels.makePng(7, 24, 16))
    assert((r, g, b) === ((r2, g2, b2)))
    assert(r > 0 && r < 255 && g > 0 && g < 255 && b > 0 && b < 255)
  }

  test("grayGrid of a uniform image is uniform, and has k*k entries") {
    val img = new java.awt.image.BufferedImage(20, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(100, 100, 100)); g2.fillRect(0, 0, 20, 20)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val grid = MediaKernels.grayGrid(bos.toByteArray, 4)
    assert(grid.length === 16)
    assert(grid.forall(v => math.abs(v - 100.0 / 255.0) < 0.01))
  }

  test("WAV round-trip: header meta and sine RMS ~= amplitude/sqrt(2)") {
    val bytes = MediaKernels.makeWav(seed = 3, sampleRate = 8000, nSamples = 1600)
    val (sr, n) = MediaKernels.audioMeta(bytes)
    assert(sr === 8000)
    assert(n === 1600L)
    val rms = MediaKernels.rms(bytes)
    val expected = (12000.0 / 32768.0) / math.sqrt(2)
    assert(math.abs(rms - expected) < 0.01)
    assert(MediaKernels.frameSample(bytes, 8).length === 8)
  }

  test("distributed image pipeline: decode + features over synthetic media") {
    import spark.implicits._
    val keys = Seq(1L, 2L, 3L).toDF("doc_id")
    val media = Multimodal.syntheticMedia(keys, "doc_id")
    assert(media.schema("image").dataType.typeName === "binary")
    val feats = Multimodal.imageFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length === 3)
    assert(feats.forall(f => f.width === 24 && f.height === 16))
    assert(feats.forall(_.thumb.length === 16))
    // determinism across independent runs of the distributed pipeline
    val again = Multimodal.imageFeatures(Multimodal.syntheticMedia(keys, "doc_id"))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.mean_r).toSeq === again.map(_.mean_r).toSeq)
  }

  test("distributed audio pipeline: meta + rms per row") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(Seq(5L, 6L).toDF("doc_id"), "doc_id")
    val feats = Multimodal.audioFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(5L, 6L))
    assert(feats.forall(f => f.sample_rate === 8000 && f.n_samples === 1600L))
    assert(feats.forall(f => f.rms > 0.1 && f.rms < 0.5))
  }

  test("silenceStats: exact run accounting on a constant tone with one gap") {
    // constant 5000-amplitude tone, one zeroed span of exactly 300
    val s = Array.fill[Short](2000)(5000)
    java.util.Arrays.fill(s, 100, 400, 0.toShort)
    val wav = MediaKernels.encodeWav(s, 8000)
    val back = MediaKernels.samples(wav)
    assert(back.toSeq === s.toSeq) // 16-bit PCM WAV is lossless
    val (nRuns, longest, silent) = MediaKernels.silenceStats(back, 1, 64)
    assert(nRuns === 1L)
    assert(longest === 300L)
    assert(silent === 300L)
    // threshold monotonicity: a higher threshold can only widen runs
    val (_, longerOrEqual, _) = MediaKernels.silenceStats(back, 6000, 64)
    assert(longerOrEqual >= 300L)
    // a run shorter than minRun is seen by `longest` but not counted
    val (n2, l2, s2) = MediaKernels.silenceStats(back, 1, 301)
    assert(n2 === 0L && l2 === 300L && s2 === 0L)
  }

  test("audioSilence finds exactly the injected dropout spans") {
    val keys = spark.range(6).toDF("doc_id")
    val media = Multimodal.injectDropouts(
      Multimodal.syntheticMedia(keys, "doc_id"))
    val rows = Multimodal.audioSilence(media, threshold = 512, minRun = 64)
      .collect().sortBy(_.media_id)
    assert(rows.length === 6)
    for (r <- rows) {
      val expectedLen = 100 + (r.media_id % 200)
      // the injected span is the only sub-threshold run of >= 64
      // samples (the tone's amplitude is 12000, far above threshold;
      // isolated near-zero crossings never reach 64 consecutive) —
      // but a crossing ADJACENT to the span can extend the run by a
      // couple of samples per side, hence the small slack
      assert(r.n_runs === 1L, s"media ${r.media_id}")
      assert(r.longest_run >= expectedLen &&
        r.longest_run <= expectedLen + 4, s"media ${r.media_id}: ${r.longest_run}")
      assert(math.abs(r.silent_frac - r.longest_run.toDouble / r.n_samples) < 1e-9)
    }
  }

  test("sceneCuts finds exactly the shot boundaries of a shot-structured video") {
    // 12 frames, shot length 3 -> boundaries at frames 3, 6, 9
    val bytes = MediaKernels.makeShotVideo(seed = 5, nFrames = 12,
      shotLen = 3, w = 24, h = 16)
    val cuts = MediaKernels.sceneCuts(bytes, threshold = 0.02)
    assert(cuts.toSeq === Seq(3, 6, 9))
    // within-shot frames are byte-identical -> diff exactly 0, so even
    // a zero threshold adds no spurious cuts
    assert(MediaKernels.sceneCuts(bytes, threshold = 0.0).toSeq === Seq(3, 6, 9))
    // a single-shot video has no cuts
    val flat = MediaKernels.makeShotVideo(7, 8, shotLen = 8, w = 24, h = 16)
    assert(MediaKernels.sceneCuts(flat, 0.02).isEmpty)
  }

  test("videoSceneCuts matches the per-media shot layout distributed") {
    val media = Multimodal.syntheticShotVideo(spark.range(6).toDF("doc_id"), "doc_id")
    val rows = Multimodal.videoSceneCuts(media).collect().sortBy(_.media_id)
    assert(rows.length === 6)
    for (r <- rows) {
      val shotLen = 2 + (r.media_id % 3).toInt
      val expected = (1 until 12).count(_ % shotLen == 0)
      assert(r.n_frames === 12)
      assert(r.n_cuts === expected.toLong, s"media ${r.media_id}")
      assert(r.first_cut === shotLen, s"media ${r.media_id}")
    }
  }

  test("distributed video pipeline: container framing + real per-frame decode") {
    import spark.implicits._
    val media = Multimodal.syntheticVideo(Seq(7L, 8L).toDF("doc_id"), "doc_id")
    val feats = Multimodal.videoFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(7L, 8L))
    assert(feats.forall(f => f.n_frames === 8 && f.width === 24 && f.height === 16))
    // seeded pixel fields -> gray means well inside (0, 1), deterministic
    assert(feats.forall(_.frame_means.forall(m => m > 0.2f && m < 0.8f)))
    val again = Multimodal.videoFeatures(
      Multimodal.syntheticVideo(Seq(7L, 8L).toDF("doc_id"), "doc_id"))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.frame_means.toSeq).toSeq === again.map(_.frame_means.toSeq).toSeq)
  }

  test("image near-dup: identical seeds are exact duplicates, sim 1.0") {
    import spark.implicits._
    // two ids forced to the same seed -> identical PNGs
    val media = Multimodal.syntheticMedia(Seq(10L, 11L).toDF("doc_id"), "doc_id")
      .union(Multimodal.syntheticMedia(Seq(10L).toDF("doc_id"), "doc_id")
        .withColumn("media_id", lit(99L)))
    val pairs = Multimodal.imageNearDups(media, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((10L, 99L)))
  }

  test("pHash: deterministic, balanced, brightness-shift invariant") {
    val img = MediaKernels.decodeImage(MediaKernels.makePng(42, 24, 16))
    val h1 = MediaKernels.phash63(img)
    val h2 = MediaKernels.phash63(
      MediaKernels.decodeImage(MediaKernels.makePng(42, 24, 16)))
    assert(h1 === h2)
    // median split -> 31 of 63 bits set (bits strictly above the median)
    assert(java.lang.Long.bitCount(h1) === 31)
    // DC exclusion -> a uniform brightness shift leaves the hash intact
    val shifted = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24) {
      val p = img.getRGB(x, y)
      def lift(c: Int) = math.min(c + 10, 255)
      shifted.setRGB(x, y, (lift((p >> 16) & 0xff) << 16) |
        (lift((p >> 8) & 0xff) << 8) | lift(p & 0xff))
    }
    val hs = MediaKernels.phash63(shifted)
    assert(java.lang.Long.bitCount(h1 ^ hs) <= 7,
      s"brightness shift moved ${java.lang.Long.bitCount(h1 ^ hs)} bits")
    // unrelated images sit near Hamming 31, far outside the radius
    val other = MediaKernels.phash63(
      MediaKernels.decodeImage(MediaKernels.makePng(43, 24, 16)))
    assert(java.lang.Long.bitCount(h1 ^ other) > 15)
  }

  test("pHash banded pairs recover every injected pixel-edit variant") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val media = Multimodal.injectImageVariants(
      Multimodal.syntheticMedia(ids, "doc_id"))
    // ids 0,4,8,...,36 gain a +1000000 variant: 10 expected pairs
    val pairs = Multimodal.imagePhashPairs(media, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (0L until 40L by 4).map(id => (id, id + 1000000L)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(got),
      s"missing variant pairs: ${expected -- got}")
    // every reported pair is within the radius; no unrelated-image pair
    assert(pairs.forall(_._3 <= 7))
    assert(got === expected, s"unexpected extra pairs: ${got -- expected}")
  }
}
