package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline over `documents`
  * (BASELINE.json north star): tokenization, quality scoring,
  * language-ID heuristic, token counting, document fingerprints.
  *
  * Everything is built-in `functions._` column expressions (codegen'd,
  * no UDFs): a 100 TB corpus scans straight through whole-stage
  * codegen with these in the projection list.
  */
object TextAnalysis {

  /** Whitespace tokens of the lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with", "at")

  /** Per-language marker profiles for the n-gram/stopword language-ID
    * heuristic. Scores are exact integer hit counts -> deterministic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Token count, distinct-token count, type-token ratio, average token
    * length, stopword ratio — the quality-score ingredients. One fused
    * kernel traversal (the column-chain formulation re-tokenized per
    * statistic on the interpreted HOF path). */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ts = graft.functions.TextHashFunctions.tokenStats(col(textCol))
    df.withColumn("__ts", ts)
      .withColumn("n_tokens", col("__ts.n_tokens"))
      .withColumn("n_distinct", col("__ts.n_distinct"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("sum_len", col("__ts.sum_len"))
      .withColumn("avg_token_len", col("sum_len").cast("double") / col("n_tokens"))
      .withColumn("n_stop", col("__ts.n_stop"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .drop("__ts")
  }

  /** Composite quality score in [0,1]: length band + lexical diversity
    * + stopword presence (the usual C4/Gopher-style cheap filters,
    * simplified). Pure arithmetic over the `stats` columns. */
  def qualityScore: Column =
    (when(col("n_tokens").between(20, 1000), lit(0.4)).otherwise(lit(0.0)) +
      least(col("ttr"), lit(0.5)) * 0.8 +
      least(col("stop_ratio") * 4, lit(0.2)))

  /** Language-ID by marker-word hit counts; deterministic argmax with
    * profile order breaking ties. Fused kernel (one token traversal
    * scoring every profile). */
  def langId(textCol: Column): Column =
    graft.functions.TextHashFunctions.langId(textCol)

  /** Concat-and-chunk sequence packing: documents in `orderCol` order
    * are laid end-to-end and cut into bins of `budget` weight (token)
    * units — `bin = floor(exclusive_prefix_sum(weight) / budget)`, the
    * standard way training corpora are packed into fixed-token-budget
    * sequences.
    *
    * Scale design: a global running sum spelled as one unpartitioned
    * window serializes the corpus through a single task. This kernel
    * runs it in two phases instead: an in-bucket running sum (window
    * PARTITIONED by `bucketExpr` — parallel across buckets) plus a
    * per-bucket total digest (one row per bucket) prefix-scanned on
    * the driver-sized side and broadcast back as each bucket's
    * carry-in. Same shape as the as-of kernel's cross-bucket carry:
    * the only single-partition window touches the digest.
    *
    * `bucketExpr` must be monotone non-decreasing in `orderCol`
    * (e.g. `col("doc_id") div 256`) so bucket order == global order.
    *
    * Output contract: the input columns plus `bin` (the packed
    * sequence id) and `pack_weight` (each row's evaluated weight, so
    * downstream per-bin aggregation doesn't re-evaluate the weight
    * expression). */
  def packBins(df: DataFrame, orderCol: String, weight: Column,
               budget: Long, bucketExpr: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("pack_weight", weight.cast("long"))
      .withColumn("__bk", bucketExpr.cast("long"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val digest = base.groupBy(col("__bk")).agg(sum(col("pack_weight")).as("__s"))
    val wC = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = digest
      .withColumn("__c", coalesce(sum(col("__s")).over(wC), lit(0L)))
      .select(col("__bk"), col("__c"))
    base.join(broadcast(carry), Seq("__bk"))
      .withColumn("__cum",
        col("__c") + coalesce(sum(col("pack_weight")).over(wIn), lit(0L)))
      .withColumn("bin", expr(s"__cum div ${budget}L"))
      .drop("__bk", "__c", "__cum")
  }

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (regex-based proxy for
    * a real tokenizer's token count). Fused count-only kernel — the
    * `size(regexp_extract_all(...))` formulation materialized the full
    * match array per row just to take its length. */
  def bpeishTokenCount(textCol: Column): Column =
    graft.functions.TextHashFunctions.bpeTokenCount(textCol)

  /** Canonical bag-of-words fingerprint: md5 of the sorted distinct
    * token set — equal fingerprints = same vocabulary (order-free
    * near-dup detector, exactly reproducible in any engine). Fused
    * kernel pass (tokenize+dedup+sort+md5 in one loop). */
  def fingerprint(textCol: Column): Column =
    graft.functions.TextHashFunctions.bowMd5(textCol)

  /** PII patterns — RE2-compatible (no lookaround), so the DuckDB
    * oracle applies the identical regexes. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Redact emails and phone numbers — the scrubbing pass a training
    * corpus runs before anything else. Pure codegen'd projection. */
  def scrubPii(textCol: Column): Column =
    regexp_replace(regexp_replace(textCol, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Fixed-size token chunks with overlap (`size` tokens per chunk,
    * stride `stride` < size ⇒ `size - stride` tokens shared between
    * consecutive chunks) — context-window packing for training data.
    * One `posexplode` over closed-form chunk starts: no shuffle, the
    * 100 TB corpus chunks in a single codegen'd scan. */
  def chunks(df: DataFrame, size_ : Int = 64, stride: Int = 48,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    df.select(col(idCol), tk.as("__tk"))
      .select(col(idCol), col("__tk"),
        posexplode(sequence(lit(0), size(col("__tk")) - 1, lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id"),
        slice(col("__tk"), col("__start") + 1, lit(size_)).as("__ck"))
      .select(col(idCol), col("chunk_id"),
        size(col("__ck")).as("n_chunk_tokens"),
        concat_ws(" ", col("__ck")).as("chunk_text"))
  }

  /** Polynomial rolling hash of the full text (content fingerprint):
    * fold over characters, h = (h*31 + code) mod 1e9+7. Sequential and
    * exact — stable across engines/partitionings; one fused kernel
    * pass instead of a per-character interpreted lambda fold. */
  def rollingHash(textCol: Column): Column =
    graft.functions.TextHashFunctions.rollingHash(textCol)
}
