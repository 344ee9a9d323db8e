package graft

/** The driver contract's structural invariants — cheap checks that
  * catch registration mistakes before a whole driver round is spent
  * discovering them. */
class ContractSpec extends GraftSpec {

  test("query names are unique (a duplicate silently drops a query from the map)") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size === names.size)
  }

  test("every oracle belongs to a registered query") {
    val names = SparkEntry.all.map(_.name).toSet
    val orphaned = SparkEntry.oracleSql.keys.filterNot(names.contains)
    assert(orphaned.isEmpty, s"oracles without queries: ${orphaned.mkString(", ")}")
  }

  test("oracle SQL strings are single statements (no stray semicolons)") {
    // the driver feeds each string to one DuckDB execute(); a trailing
    // or embedded semicolon would break the comparison harness
    val bad = SparkEntry.oracleSql.filter(_._2.contains(";"))
    assert(bad.isEmpty, s"semicolons in: ${bad.keys.mkString(", ")}")
  }

  test("no two oracles are byte-identical (a paste error would grade two ops against one truth)") {
    val dups = SparkEntry.oracleSql.groupBy(_._2).filter(_._2.size > 1)
      .values.map(_.keys.toSeq.sorted.mkString("+")).toSeq
    // same-answer/different-plan twins INTENTIONALLY share one truth:
    // stream twins vs their batch queries, the bucketed q3, the
    // sorted-input quantile variant, and MERGE-upsert == latest-per-
    // user; everything else must be distinct
    val intended = Set(
      "a2_quantiles+a2_quantiles_sorted",
      "q3_bucketed+q3_top_orders",
      "q_latest_per_user+q_merge_upsert")
    val unexpected = dups.filterNot(p => p.contains("q_stream") ||
      intended.contains(p))
    assert(unexpected.isEmpty,
      s"byte-identical oracles outside the stream-twin convention: ${unexpected.mkString("; ")}")
  }

  test("oracle coverage: the no-oracle set is the documented one, nothing silently dropped") {
    val noOracle = SparkEntry.all.map(_.name).toSet -- SparkEntry.oracleSql.keys.toSet
    // every entry here is rows-only BY NATURE (sketches whose exact
    // values are engine-specific, plan-stats, media codecs) — adding a
    // query without an oracle by accident should fail this test
    val documented = Set(
      "a2_quantiles_approx", "corpus_heavy_hitters_approx",
      "q_group_quantiles_approx", "q_distinct_users_approx",
      "k4_size_metrics",
      "text_compression_ratio",
      "mm_audio_features", "mm_audio_silence", "mm_audio_pitch",
      "mm_audio_snr", "mm_image_dhash",
      "mm_image_features",
      "mm_image_neardup", "mm_image_phash", "mm_video_features",
      "mm_video_scenecut")
    val undocumented = noOracle -- documented
    assert(undocumented.isEmpty,
      s"queries with no oracle and no documented reason: ${undocumented.mkString(", ")}")
  }

  test("bench headline subset names resolve to registered queries") {
    // Bench prints a fixed headline map sized for the capture window; a
    // renamed query would silently vanish from the cross-round series
    val headline = Seq(
      "q1_pricing_summary", "q5_region_revenue", "q3_top_orders",
      "y_sync_flagship", "y5_asof_nearest", "y5_asof_pad", "y7_event_pivot",
      "f4_spike_smooth", "a4_corr_matrix", "a2_quantiles",
      "dedup_exact", "dedup_neardup_minhash", "dedup_neardup_groups",
      "sim_topk_bruteforce", "sim_topk_lsh", "sim_topk_ivf",
      "text_tfidf", "text_pii_scrub", "text_langid",
      "pipe_seq_pack", "pipe_shard_shuffle", "pipe_corpus_mix",
      "q_stream_tumbling", "q_stream_sessionize",
      "io_minmax_skip", "io_compact_small_files", "io_csv_roundtrip")
    val missing = headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not registered: ${missing.mkString(", ")}")
  }
}
