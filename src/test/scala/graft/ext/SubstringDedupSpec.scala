package graft.ext

import graft.{GraftSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Cross-operator laws for the exact substring dedup pair
  * (detection `text_substring_dedup` / transform
  * `text_substring_removal`) and the Bradley-Terry fit — structural
  * invariants the per-value oracle can't express. */
class SubstringDedupSpec extends GraftSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("substring dedup: merged spans never exceed the document") {
    val rows = run("text_substring_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val dup = r.getAs[Long]("dup_tokens")
      val spans = r.getAs[Long]("n_spans")
      val sh = r.getAs[Long]("n_dup_shingles")
      assert(dup >= 8 && dup <= n, s"doc ${r.get(0)}: dup=$dup n=$n")
      // every span covers >= 8 tokens and spans are disjoint
      assert(dup >= spans * 8, s"doc ${r.get(0)}: spans=$spans dup=$dup")
      assert(sh >= spans, "each span holds at least one shingle")
    }
  }

  test("substring removal: conservation and detection-side bound") {
    val det = run("text_substring_dedup").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    val rows = run("text_substring_removal").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_tokens")
      val rm = r.getAs[Long]("removed_tokens")
      val kept = r.getAs[Long]("kept_tokens")
      assert(rm + kept == n, s"doc $id: conservation")
      // removal keeps the first occurrence, so it never removes more
      // than detection marked as duplicated
      assert(rm <= det.getOrElse(id, 0L), s"doc $id: rm=$rm > detected")
    }
    // the transform must remove SOMETHING on a corpus with known dups
    assert(rows.map(_.getAs[Long]("removed_tokens")).sum > 0)
  }

  test("bradley-terry: strengths are a normalized distribution over sources") {
    val rows = run("pipe_bradley_terry").collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("strength_ppm")).sum
    // floor division loses at most 1 ppm per player
    assert(tot <= 1000000L && tot >= 1000000L - rows.length,
      s"strength mass $tot")
    rows.foreach { r =>
      assert(r.getAs[Long]("strength_ppm") >= 0)
      assert(r.getAs[Long]("n_wins") >= 0)
    }
    // a source that wins nothing must not out-rank a frequent winner
    val byWins = rows.sortBy(_.getAs[Long]("n_wins"))
    if (byWins.last.getAs[Long]("n_wins") > 0)
      assert(byWins.last.getAs[Long]("strength_ppm") >=
        byWins.head.getAs[Long]("strength_ppm"))
  }
}
