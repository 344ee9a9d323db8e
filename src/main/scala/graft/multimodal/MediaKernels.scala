package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** JVM kernels for multimodal (image/audio) columns. Decode is REAL —
  * `javax.imageio` (PNG/JPEG) and `javax.sound.sampled` (WAV) ship
  * with the JDK — so the pipeline exercises true binary→pixels/samples
  * work, not a stubbed fake. Synthetic generators produce
  * deterministic media for the driver tables (seeded per row), which
  * also makes results reproducible without binary fixtures. */
object MediaKernels {

  // ---- image ----------------------------------------------------------

  /** Deterministic small RGB PNG: a seeded linear-congruential pixel
    * field. Same seed → byte-identical image on any JVM. */
  def makePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var state = seed * 6364136223846793005L + 1442695040888963407L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        state = state * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((state >>> 24) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodeImage(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** Re-encode an image through the same PNG codec (variant builds,
    * thumbnail persists). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 63-bit DCT perceptual hash (pHash, the classic duplicate-image
    * fingerprint): 32×32 grayscale grid → separable 2-D DCT-II → the
    * top-left 8×8 low-frequency block → each non-DC coefficient
    * becomes one bit, set when it exceeds the block's median. The DC
    * term is EXCLUDED, which is what makes the hash invariant to
    * uniform brightness shifts; small local edits flip at most a few
    * low-frequency bits, so near-dups land within a small Hamming
    * radius while unrelated images sit near 31/63. Pure per-row
    * double arithmetic — deterministic on any JVM. */
  def phash63(img: BufferedImage): Long = {
    val n = 32
    val g = grayGrid(img, n)
    // cos table for the 8 lowest output frequencies only — the DCT is
    // separable and we never need the other 24 rows/cols. Entries are
    // quantized to a 1e-9 grid (the repo's trig-quantization
    // discipline, q_cross_spectrum/q_circular_stats): libm cos is only
    // 1-ulp-accurate and differs between the JVM and the numpy replay
    // in tools/media_oracle.py — on the grid both engines feed
    // IDENTICAL doubles into the exactly-replicated summation order.
    val cosTab = Array.tabulate(8, n)((u, x) =>
      math.rint(math.cos(math.Pi * (2 * x + 1) * u / (2.0 * n)) * 1e9)
        / 1e9)
    val rows = Array.ofDim[Double](n, 8)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < n) { s += g(y * n + x) * cosTab(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coeffs = new Array[Double](63)
    var i = 0
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        if (v != 0 || u != 0) {
          var s = 0.0
          var yy = 0
          while (yy < n) { s += rows(yy)(u) * cosTab(v)(yy); yy += 1 }
          coeffs(i) = s
          i += 1
        }
        u += 1
      }
      v += 1
    }
    val sorted = coeffs.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var h = 0L
    i = 0
    while (i < 63) {
      if (coeffs(i) > med) h |= (1L << i)
      i += 1
    }
    h
  }

  /** 63-bit difference hash (dHash, the gradient fingerprint): 9×9
    * pure-bilinear grayscale grid → horizontal neighbor comparisons
    * over the first 8 rows (the last comparison is dropped to keep
    * the hash in 63 bits like [[phash63]], so the byte-banding never
    * touches the sign bit). Complements the DCT pHash: dHash keys on
    * local gradients where pHash keys on low-frequency structure, so
    * the two catch different edit classes. Pure double arithmetic —
    * replayable by tools/media_oracle.py. */
  def dhash63(img: BufferedImage): Long = {
    val g = grayGrid(img, 9)
    var h = 0L
    var i = 0
    var y = 0
    while (y < 8 && i < 63) {
      var x = 0
      while (x < 8 && i < 63) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) h |= (1L << i)
        i += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** (width, height) without materializing features. */
  def imageMeta(bytes: Array[Byte]): (Int, Int) = {
    val img = decodeImage(bytes)
    (img.getWidth, img.getHeight)
  }

  /** 256-bin histogram of the red channel — the per-image intensity
    * distribution the entropy/quality probes read. */
  def redHistogram(img: BufferedImage): Array[Long] = {
    val h = new Array[Long](256)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h(((img.getRGB(x, y) >> 16) & 0xff)) += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Shannon entropy (nats) of a histogram, summed in ascending bin
    * order — the fixed order keeps the float sum reproducible. */
  def histEntropyNats(hist: Array[Long]): Double = {
    val n = hist.sum.toDouble
    var e = 0.0
    var i = 0
    while (i < hist.length) {
      if (hist(i) > 0) {
        val p = hist(i) / n
        e -= p * math.log(p)
      }
      i += 1
    }
    e
  }

  /** Per-channel means in [0,255] — the cheap quality/feature probe. */
  def channelMeans(bytes: Array[Byte]): (Double, Double, Double) =
    channelMeans(decodeImage(bytes))

  /** Decoded-image overload: feature pipelines decode each blob ONCE
    * and derive every feature from the same `BufferedImage`. */
  def channelMeans(img: BufferedImage): (Double, Double, Double) = {
    var (r, g, b) = (0.0, 0.0, 0.0)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    (r / n, g / n, b / n)
  }

  /** Resize to k×k (area-average via Graphics2D bilinear) and return
    * the grayscale grid as a flat k·k float feature vector in [0,1] —
    * the standard thumbnail embedding for image near-dup. */
  def grayGrid(bytes: Array[Byte], k: Int): Array[Float] =
    grayGrid(decodeImage(bytes), k)

  /** k×k grayscale grid by PURE-arithmetic bilinear resampling with
    * pixel-center alignment (src = (dst + 0.5)·S/k − 0.5, edge-
    * clamped) — deliberately NOT Java2D `drawImage`, whose output
    * depends on the rendering pipeline (software loops vs platform
    * acceleration differ at the ulp and sometimes the pixel level),
    * so every grid-derived fingerprint (pHash, scene-cut, thumbnail
    * cosine) is reproducible on any JVM AND replayable bit-exactly by
    * `tools/media_oracle.py`'s numpy twin. Channels interpolate as
    * doubles (no intermediate 8-bit quantize); luma weights are the
    * BT.601 constants used everywhere else in this file. */
  def grayGrid(img: BufferedImage, k: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](k * k)
    var y = 0
    while (y < k) {
      var sy = (y + 0.5) * h / k - 0.5
      if (sy < 0) sy = 0
      if (sy > h - 1) sy = (h - 1).toDouble
      val y0 = sy.toInt
      val y1 = if (y0 + 1 < h) y0 + 1 else y0
      val fy = sy - y0
      var x = 0
      while (x < k) {
        var sx = (x + 0.5) * w / k - 0.5
        if (sx < 0) sx = 0
        if (sx > w - 1) sx = (w - 1).toDouble
        val x0 = sx.toInt
        val x1 = if (x0 + 1 < w) x0 + 1 else x0
        val fx = sx - x0
        val p00 = img.getRGB(x0, y0)
        val p01 = img.getRGB(x1, y0)
        val p10 = img.getRGB(x0, y1)
        val p11 = img.getRGB(x1, y1)
        def ch(sh: Int): Double = {
          val a = ((p00 >> sh) & 0xff) * (1.0 - fx) + ((p01 >> sh) & 0xff) * fx
          val b = ((p10 >> sh) & 0xff) * (1.0 - fx) + ((p11 >> sh) & 0xff) * fx
          a * (1.0 - fy) + b * fy
        }
        val gray = 0.299 * ch(16) + 0.587 * ch(8) + 0.114 * ch(0)
        out(y * k + x) = (gray / 255.0).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- video ----------------------------------------------------------
  // No video codec ships with the JDK, so the container is ours: a
  // magic header + length-prefixed PNG frames. The per-frame DECODE is
  // real (ImageIO); only the container framing is synthetic — the
  // Spark-side plumbing (schema, partitioning, per-row kernel work)
  // is exactly what a real codec would ride.

  private val VideoMagic = 0x47564944 // "GVID"

  /** Deterministic "video": `nFrames` seeded PNG frames, each frame's
    * pixel field derived from (seed, frameIdx). */
  def makeVideo(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(VideoMagic)
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val png = makePng(seed * 31 + f, w, h)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** All frame blobs of the container (checked header). */
  def videoFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == VideoMagic, "not a GVID container")
    val n = in.readInt()
    Array.fill(n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    }
  }

  /** Shot-structured synthetic video: frames repeat within a shot and
    * change only at boundaries (every `shotLen` frames), so scene-cut
    * detection has a deterministic ground truth. Same container
    * format as `makeVideo`. */
  def makeShotVideo(seed: Long, nFrames: Int, shotLen: Int,
                    w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(VideoMagic)
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val shot = f / shotLen
      val png = makePng(seed * 131 + shot, w, h)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Scene-cut positions: frame indices f >= 1 where the mean absolute
    * grayscale-grid difference to frame f-1 exceeds `threshold`
    * (grids are [0,1]-normalized). One decode pass; O(1) state
    * between frames. */
  def sceneCuts(bytes: Array[Byte], threshold: Double, k: Int = 4): Array[Int] = {
    val frames = videoFrames(bytes)
    if (frames.length < 2) return Array.empty
    val cuts = Array.newBuilder[Int]
    var prev = grayGrid(decodeImage(frames(0)), k)
    var f = 1
    while (f < frames.length) {
      val cur = grayGrid(decodeImage(frames(f)), k)
      var acc = 0.0
      var i = 0
      while (i < cur.length) { acc += math.abs(cur(i) - prev(i)); i += 1 }
      if (acc / cur.length > threshold) cuts += f
      prev = cur
      f += 1
    }
    cuts.result()
  }

  /** k evenly spaced frames, decoded, reduced to grayscale means —
    * the video frame-sample + feature op. */
  def frameSampleVideo(bytes: Array[Byte], k: Int): Array[Float] = {
    val frames = videoFrames(bytes)
    if (frames.isEmpty) return new Array[Float](k)
    val out = new Array[Float](k)
    var i = 0
    while (i < k) {
      val idx = ((i.toLong * frames.length) / k).toInt
      val (r, g, b) = channelMeans(decodeImage(frames(idx)))
      out(i) = ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
      i += 1
    }
    out
  }

  // ---- audio ----------------------------------------------------------

  /** Deterministic mono PCM16 WAV: a seeded sine with seeded phase —
    * same seed → byte-identical file. */
  def makeWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val freq = 110.0 + (math.abs(seed) % 880)
    val phase = (seed % 628) / 100.0
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (math.sin(phase + 2 * math.Pi * freq * i / sampleRate) * 12000).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** PCM16 samples → WAV container (the encode half of `samples`). */
  def encodeWav(s: Array[Short], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](s.length * 2)
    var i = 0
    while (i < s.length) {
      pcm(2 * i) = (s(i) & 0xff).toByte
      pcm(2 * i + 1) = ((s(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, s.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Silence-run statistics over the PCM payload — the VAD/dropout
    * primitive: a silent run is a maximal consecutive span with
    * |sample| < threshold; runs of at least `minRun` samples count.
    * Returns (qualifying runs, longest sub-threshold run regardless of
    * minRun, samples inside qualifying runs). One pass, O(1) state. */
  def silenceStats(s: Array[Short], threshold: Int, minRun: Int): (Long, Long, Long) = {
    var nRuns = 0L; var longest = 0L; var silent = 0L
    var run = 0L
    var i = 0
    while (i <= s.length) {
      val inRun = i < s.length && math.abs(s(i).toInt) < threshold
      if (inRun) run += 1
      else {
        if (run > longest) longest = run
        if (run >= minRun) { nRuns += 1; silent += run }
        run = 0
      }
      i += 1
    }
    (nRuns, longest, silent)
  }

  /** (sampleRate, nSamples) from the WAV header. */
  def audioMeta(bytes: Array[Byte]): (Int, Long) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try (ais.getFormat.getSampleRate.toInt, ais.getFrameLength)
    finally ais.close()
  }

  /** PCM16 payload as samples — decode once, feed `rms`/`frameSample`. */
  def samples(bytes: Array[Byte]): Array[Short] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val raw = ais.readAllBytes()
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      out
    } finally ais.close()
  }

  /** RMS amplitude of the PCM16 payload, normalized to [0,1]. */
  def rms(bytes: Array[Byte]): Double = rms(samples(bytes))

  def rms(s: Array[Short]): Double = {
    if (s.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < s.length) { val v = s(i) / 32768.0; acc += v * v; i += 1 }
    math.sqrt(acc / s.length)
  }

  /** Dominant frequency (Hz) by a Goertzel scan over the integer
    * candidate grid [fLo, fHi] — pitch detection without an FFT
    * library. Each candidate's coefficient 2·cos(2πf/sr) is quantized
    * to the 1e-9 grid (the repo trig discipline) and the recurrence
    * s_n = x_n + c·s_{n−1} − s_{n−2} runs in plain doubles, so
    * `tools/media_oracle.py` replays the whole scan bit-exactly in
    * numpy. Ties break to the lower frequency (strict > on power).
    * Per-row work is (fHi−fLo+1)·n flops — embarrassingly parallel
    * scan work, no shuffle. */
  def dominantFreq(s: Array[Short], sampleRate: Int,
                   fLo: Int, fHi: Int): Int = {
    var best = fLo
    var bestP = -1.0
    var f = fLo
    while (f <= fHi) {
      val c = math.rint(
        2.0 * math.cos(2.0 * math.Pi * f / sampleRate) * 1e9) / 1e9
      var s1 = 0.0
      var s2 = 0.0
      var i = 0
      while (i < s.length) {
        val v = s(i) + c * s1 - s2
        s2 = s1
        s1 = v
        i += 1
      }
      val p = s1 * s1 + s2 * s2 - c * s1 * s2
      if (p > bestP) { bestP = p; best = f }
      f += 1
    }
    best
  }

  /** k evenly spaced samples (normalized) — the "frame sample" op for
    * audio; the video analogue samples frames the same way. */
  def frameSample(bytes: Array[Byte], k: Int): Array[Float] =
    frameSample(samples(bytes), k)

  def frameSample(s: Array[Short], k: Int): Array[Float] = {
    if (s.isEmpty) return new Array[Float](k)
    val out = new Array[Float](k)
    var i = 0
    while (i < k) {
      out(i) = (s(((i.toLong * s.length) / k).toInt) / 32768.0).toFloat
      i += 1
    }
    out
  }
}
