package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning laws: no false negatives (the property
  * that makes the prune-then-join rewrite exact), and the prune
  * actually prunes (selectivity < 1) so `q_bloom_prune` demonstrates a
  * real shuffle reduction, not a no-op. */
class BloomSpec extends GraftSpec {

  test("no false negatives: every built key passes mightContain") {
    val keys = spark.range(0, 2000, 2).select(col("id"))
    val h = BloomFunctions.buildBroadcast(keys, "id", 1000, 0.03)
    val missed = keys
      .filter(!BloomFunctions.mightContain(col("id"), h)).count()
    assert(missed === 0L)
  }

  test("prune-then-join == plain join, and the prune removes most non-members") {
    val fact = spark.range(0, 10000).select(col("id"),
      (col("id") % 100).as("v"))
    val dim = spark.range(0, 10000, 50).select(col("id").as("k"))
    val h = BloomFunctions.buildBroadcast(dim, "k", 200, 0.01)
    val pruned = fact.filter(BloomFunctions.mightContain(col("id"), h))
    val kept = pruned.count()
    // 200 members of 10000; fpp 1% -> expect well under 10% kept
    assert(kept >= 200L && kept < 1000L, s"prune kept $kept of 10000")
    val viaBloom = pruned.join(dim, col("id") === col("k"))
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    val plain = fact.join(dim, col("id") === col("k"))
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(viaBloom === plain)
  }

  test("unknown handle fails at plan time, not silently") {
    intercept[Exception] {
      spark.range(1)
        .filter(BloomFunctions.mightContain(col("id"), -12345L)).count()
    }
  }
}
