package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Dedup operators: exact content-hash groups, shingle/Jaccard
  * mechanics, MinHash-LSH candidate soundness, SimHash determinism. */
class DedupSpec extends GraftSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: distinct word 3-grams; short texts yield empty") {
    import spark.implicits._
    val out = Seq("a b c d", "a b", "x y z x y z").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(out(0) === Set("a b c", "b c d"))
    assert(out(1) === Set.empty)
    assert(out(2) === Set("x y z", "y z x", "z x y")) // distinct
  }

  test("jaccard of known sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j === 0.5 +- 1e-12)
  }

  test("exactDups marks non-minimum ids of identical-text groups") {
    val out = Dedup.exactDups(docs((1L, "same text"), (2L, "same text"), (3L, "other")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq((1L, 2L, false), (2L, 2L, true), (3L, 1L, false)))
  }

  test("minhashNearDups finds identical docs and skips disjoint ones") {
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val other = (100 to 120).map(i => s"w$i").mkString(" ")
    val out = Dedup.minhashNearDups(
      docs((1L, text), (2L, text), (3L, other)), 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("minhashNearDups catches a near-duplicate above threshold") {
    val base = (1 to 30).map(i => s"tok$i")
    val nearDup = base.updated(15, "CHANGED")
    val out = Dedup.minhashNearDups(
      docs((1L, base.mkString(" ")), (2L, nearDup.mkString(" "))), 0.7)
      .collect()
    // 28 shingles each, 25 shared -> J = 25/31 ≈ 0.806 >= 0.7; LSH with
    // 4 bands of 4 rows catches it with near-certainty at this J, and
    // the fixed md5-derived permutations make it deterministic.
    assert(out.length === 1)
    val j = out.head.getDouble(2)
    assert(j === 25.0 / 31.0 +- 1e-12)
  }

  test("simhash: identical texts agree, fingerprint fits nBits") {
    val out = docs((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "completely different words here"))
      .select(Dedup.simhash(col("text"), 32).as("h")).collect().map(_.getLong(0))
    assert(out(0) === out(1))
    assert(out.forall(h => h >= 0 && h < (1L << 32)))
    assert(out(0) !== out(2))
  }

  test("simhashNearDups: identical token sets pair at hamming 0, distinct text does not") {
    val out = Dedup.simhashNearDups(docs(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha alpha"), // same token SET -> same fingerprint
      (3L, "totally different words entirely unrelated content here")),
      maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 0L)))
  }

  test("connectedComponents labels every node with its component minimum") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round),
    // pair 10-11, and 20-21-22 sharing hub 20
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("strHash60 is reproducible from md5 hex") {
    import spark.implicits._
    val h = Seq("abc").toDF("s").select(Dedup.strHash60(col("s"))).head().getLong(0)
    // first 15 hex chars of md5("abc") = 900150983cd24fb
    assert(h === java.lang.Long.parseLong("900150983cd24fb", 16))
  }
}
