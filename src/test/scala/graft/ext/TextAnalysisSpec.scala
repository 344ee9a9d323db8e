package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Text-analysis operators: stats arithmetic, language-ID argmax,
  * fingerprints, BPE-ish token counting — all hand-computable. */
class TextAnalysisSpec extends GraftSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("stats: tokens, distinct, ttr, avg length, stopword ratio") {
    val r = TextAnalysis.stats(one("the cat sat on the mat"))
      .select("n_tokens", "n_distinct", "ttr", "avg_token_len", "n_stop", "stop_ratio")
      .head()
    assert(r.getInt(0) === 6)
    assert(r.getInt(1) === 5)
    assert(r.getDouble(2) === 5.0 / 6.0 +- 1e-12)
    assert(r.getDouble(3) === 17.0 / 6.0 +- 1e-12) // 3+3+3+2+3+3
    assert(r.getInt(4) === 3)                      // the, on, the
    assert(r.getDouble(5) === 0.5 +- 1e-12)
  }

  test("qualityScore composes the three signals") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ") // 25 distinct tokens
    val r = TextAnalysis.stats(one(text))
      .select(TextAnalysis.qualityScore).head().getDouble(0)
    // length band 0.4 + min(ttr=1.0, .5)*0.8 = 0.4 + stop 0
    assert(r === 0.8 +- 1e-12)
  }

  test("langId: marker argmax with profile-order ties, und on no hits") {
    import spark.implicits._
    val out = Seq(
      "the cat and the dog is here",
      "der hund ist nicht ein katze",
      "el perro y la casa de los gatos",
      "qwerty zzz xxx").toDF("text")
      .select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "de", "es", "und"))
  }

  test("rollingHash matches the hand-computed polynomial") {
    // "ab": ((0*31+97)*31+98) = 3105
    val r = one("ab").select(TextAnalysis.rollingHash(col("text"))).head()
    assert(r.getLong(0) === 3105L)
  }

  test("bpeishTokenCount: letter runs, digit runs, single punctuation") {
    val r = one("Hello, world 42!")
      .select(TextAnalysis.bpeishTokenCount(col("text"))).head()
    assert(r.getInt(0) === 5) // hello , world 42 !
  }

  test("scrubPii redacts emails and phone numbers, leaves the rest") {
    val r = one("mail a.b+c@d-e.org or call 555-123-4567 now")
      .select(TextAnalysis.scrubPii(col("text"))).head()
    assert(r.getString(0) === "mail <EMAIL> or call <PHONE> now")
  }

  test("chunks: size/stride windows with overlap, short docs one chunk") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunks(
      Seq((1L, doc), (2L, "tiny text")).toDF("doc_id", "text"),
      size_ = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1: starts 0,3,6,9 -> chunks of 4,4,4,1 tokens with 1 overlap
    assert(out.filter(_._1 == 1L).map(_._4).toSeq ===
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq === Seq("tiny text"))
  }

  test("packBins: two-phase prefix sum == sequential concat-and-chunk, any bucketing") {
    import spark.implicits._
    // deterministic uneven weights; ids deliberately shuffled on input
    val rows = (0L until 200L).map(i => (i, 1L + (i * 37 + 11) % 97))
    val df = scala.util.Random.shuffle(rows).toDF("id", "w")
      .repartition(5)
    val budget = 250L
    // sequential reference: exclusive running sum div budget
    var cum = 0L
    val expect = rows.map { case (id, w) =>
      val bin = cum / budget; cum += w; id -> bin
    }.toMap
    for (bucketDiv <- Seq(1L, 7L, 64L, 1000L)) {
      val got = TextAnalysis.packBins(df, "id", col("w"), budget,
        expr(s"id div $bucketDiv"))
        .select("id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"bucketDiv=$bucketDiv")
    }
  }

  test("fingerprint is order-free over the distinct token set") {
    import spark.implicits._
    val out = Seq("b a c", "c b a", "a b c c", "a b d").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(out(0) === out(1))
    assert(out(0) === out(2)) // duplicates collapse
    assert(out(0) !== out(3))
  }

  test("compressionRatio orders redundancy correctly and stays bounded") {
    import graft.functions.HashKernels
    val repetitive = "spam ham " * 200
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders through seventeen distinct meadows naming each flower ") * 4
    val incompressible = (1 to 50)
      .map(i => java.util.UUID.nameUUIDFromBytes(Array(i.toByte)).toString)
      .mkString("")
    val rr = HashKernels.compressionRatio(repetitive)
    val rp = HashKernels.compressionRatio(prose)
    val ri = HashKernels.compressionRatio(incompressible)
    assert(rr < rp, s"repetitive $rr !< prose $rp")
    assert(rp < ri, s"prose $rp !< incompressible $ri")
    for (r <- Seq(rr, rp, ri)) assert(r > 0.0 && r <= 1.2, r.toString)
    assert(HashKernels.compressionRatio("") === 1.0) // empty -> neutral
  }

  test("charEntropy: closed-form values, order-free, codepoint-aware") {
    import graft.functions.HashKernels
    // uniform over k symbols -> log2(k) (up to the 1e-9 term rounding)
    assert(HashKernels.charEntropy("abcd") === 2.0 +- 1e-8)
    assert(HashKernels.charEntropy("ab") === 1.0 +- 1e-8)
    // single symbol -> 0; empty -> 0
    assert(HashKernels.charEntropy("aaaa") === 0.0 +- 1e-12)
    assert(HashKernels.charEntropy("") === 0.0)
    // permutation-invariant (counts only)
    assert(HashKernels.charEntropy("aabbc") === HashKernels.charEntropy("bacab"))
    // p=(1/2,1/4,1/4) -> 1.5 bits
    assert(HashKernels.charEntropy("aabc") === 1.5 +- 1e-8)
    // non-ASCII codepoints count as single symbols
    assert(HashKernels.charEntropy("世界") === 1.0 +- 1e-8)
  }
}
