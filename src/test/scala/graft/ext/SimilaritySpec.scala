package graft.ext

import graft.GraftSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Vector kernels + similarity search: exact values, loud dimension
  * failures, brute-force ranking, LSH candidate recall on duplicates. */
class SimilaritySpec extends GraftSpec {

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("vec_dot and cosine_sim compute exact values") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.vec_dot(spark, col("a"), col("b")),
      VectorFunctions.cosine_sim(spark, col("a"), col("b"))).head()
    assert(r.getDouble(0) === 32.0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(r.getDouble(1) === expected +- 1e-12)
  }

  test("orthogonal vectors have cosine 0; identical have cosine 1") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    val out = df.select(VectorFunctions.cosine_sim(spark, col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(out(0) === 0.0 +- 1e-12)
    assert(out(1) === 1.0 +- 1e-12)
  }

  test("zero-norm vector yields null, not a fabricated 0") {
    import spark.implicits._
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(VectorFunctions.cosine_sim(spark, col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("dimension mismatch raises instead of silently truncating") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.vec_dot(spark, col("a"), col("b"))).head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("vector length mismatch")))
  }

  test("float arrays work through the same kernel") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(VectorFunctions.vec_dot(spark, col("a"), col("b"))).head()
    assert(r.getDouble(0) === 11.0)
  }

  test("bruteForceTopK ranks by cosine desc with neighbor_id tiebreak") {
    // query v1=(1,0); corpus: v2=(2,0) cos=1, v3=(1,1) cos=.707, v4=(0,1) cos=0
    val corpus = vecs((1L, Seq(1.0, 0.0)), (2L, Seq(2.0, 0.0)),
      (3L, Seq(1.0, 1.0)), (4L, Seq(0.0, 1.0)))
    val out = Similarity.bruteForceTopK(corpus, vecs((1L, Seq(1.0, 0.0))), 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._2).toSeq === Seq(2L, 3L, 4L))
    assert(out(0)._3 === 1.0 +- 1e-12)
    assert(out(1)._3 === math.sqrt(0.5) +- 1e-12)
    assert(out(2)._3 === 0.0 +- 1e-12)
  }

  test("lshTopK finds exact duplicates (identical signatures share every bucket)") {
    val dup = Seq.tabulate(16)(i => math.sin(i + 1.0))
    val corpus = vecs(Seq.tabulate(20)(i =>
      (i.toLong, Seq.tabulate(16)(j => math.cos(i * 17 + j)))) :+ (99L, dup): _*)
    val out = Similarity.lshTopK(corpus, vecs((100L, dup)), 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.length === 1)
    assert(out.head._2 === 99L)
    assert(out.head._3 === 1.0 +- 1e-12)
  }

  test("ivfTopK with probe-all equals exact brute force; tight probe finds duplicates") {
    val corpus = vecs(Seq.tabulate(40)(i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 13 + j) + (i % 4) * 5.0))): _*)
    val qs = vecs((3L, Seq.tabulate(8)(j => math.sin(3 * 13 + j) + 3 * 5.0)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    val exact = rows(Similarity.bruteForceTopK(corpus, qs, 5))
    val probeAll = rows(Similarity.ivfTopK(corpus, qs, 5, nCentroids = 4, nProbe = 4))
    assert(probeAll === exact, "nProbe == nCentroids must degenerate to brute force")
    // a duplicated vector lands in the same cell -> found at nProbe 1
    val dup = Seq.tabulate(8)(_.toDouble)
    val corpus2 = vecs((1L, dup), (2L, dup.map(_ + 20)), (3L, dup.map(_ - 20)))
    val found = Similarity.ivfTopK(corpus2, vecs((99L, dup)), 1,
      nCentroids = 3, nProbe = 1).collect()
    assert(found.length === 1 && found.head.getLong(2) === 1L)
    assert(found.head.getDouble(3) === 1.0 +- 1e-12)
  }

  test("dimOf measures the embedding width from data") {
    assert(Similarity.dimOf(vecs((1L, Seq(1.0, 2.0, 3.0))), "embedding") === 3)
  }

  test("md5Hash60 matches Spark's md5-derived strHash60 column (oracle parity)") {
    import spark.implicits._
    // the same md5 text both Dedup.strHash60 and the DuckDB oracle
    // hash — pins JVM MessageDigest == Spark md5() == DuckDB md5()
    val strs = Seq("rp:0:0:0", "rp:7:5:63", "hello", "")
    val viaSpark = strs.toDF("s")
      .select(Dedup.strHash60(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(viaSpark === strs.map(Similarity.md5Hash60))
  }

  test("hyperplanes are deterministic, bounded, and table-distinct") {
    val a = Similarity.hyperplanes(4, 16, 0)
    val b = Similarity.hyperplanes(4, 16, 0)
    val c = Similarity.hyperplanes(4, 16, 1)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq !== c.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v >= -1.0 && v <= 1.0))
    // golden value (independently computed: md5('rp:0:0:0') mapping)
    assert(a(0)(0) === -0.002644 +- 1e-12)
  }

  test("fused lsh_signatures kernel equals the per-table signature composition") {
    val corpus = vecs(Seq.tabulate(25)(i =>
      (i.toLong, Seq.tabulate(16)(j => math.sin(i * 31 + j * 5)))): _*)
    val (nTables, nPlanes, dim) = (8, 6, 16)
    val fused = corpus.select(col("vec_id"),
      VectorFunctions.lsh_signatures(spark, col("embedding"), nTables, nPlanes, dim)
        .as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = corpus.select(col("vec_id") +: (0 until nTables).map { t =>
        Similarity.signature(spark, col("embedding"),
          Similarity.hyperplanes(nPlanes, dim, t)).as(s"s$t")
      }: _*)
      .collect().map(r => r.getLong(0) -> (1 to nTables).map(r.getLong(_))).toMap
    assert(fused.keySet === composed.keySet)
    fused.foreach { case (id, sigs) => assert(sigs === composed(id), s"vec $id") }
  }

  test("lshTopK recall >= 0.8 on clustered data at default parameters") {
    val rnd = new scala.util.Random(7)
    // 12 cluster centers × 5 members with small perturbations: the
    // true top-4 of each member are its cluster mates (cosine ~0.99)
    val centers = Array.fill(12)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for {
      c <- centers.indices; m <- 0 until 5
    } yield ((c * 5 + m).toLong,
      centers(c).map(x => x + rnd.nextGaussian() * 0.02).toSeq)
    val corpus = vecs(rows: _*)
    val queries = vecs(rows.take(10): _*)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries, 4))
    val ann = pairs(Similarity.lshTopK(corpus, queries, 4))
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8 on clustered data")
  }

  test("ivfTopK recall >= 0.8 on clustered data at the shipped nProbe=4") {
    // same clustered generator as the LSH test: realistic embedding
    // corpora cluster, and at the SHIPPED config the index must find
    // the cluster mates. (The driver's sim_recall_ann row measures the
    // same configs on uniform-random vectors — ANN's worst case — so
    // the two numbers together bound the operating envelope.)
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(12)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for {
      c <- centers.indices; m <- 0 until 5
    } yield ((c * 5 + m).toLong,
      centers(c).map(x => x + rnd.nextGaussian() * 0.02).toSeq)
    val corpus = vecs(rows: _*)
    val queries = vecs(rows.take(10): _*)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries, 4))
    val ann = pairs(Similarity.ivfTopK(corpus, queries, 4)) // nProbe=4 default
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8 on clustered data")
  }

  test("recall is monotone in the ANN knobs (candidate-nesting law, real embeddings)") {
    // hyperplane component (t, p, j) is md5-derived from those indices
    // alone, so 4-plane signatures are bit-prefixes of 6-plane ones:
    // candidates(p6) ⊆ candidates(p4) per table. IVF probes the sorted
    // nearest cells, so probe-4 cells ⊆ probe-8 cells. Both make
    // "wider search never loses recall" an exact law — asserted on the
    // real (uniform-random, worst-case) embeddings the driver grades.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, q, 5))
    def recall(ann: Set[(Long, Long)]) =
      (exact intersect ann).size.toDouble / exact.size
    val rLsh4 = recall(pairs(Similarity.lshTopK(emb, q, 5, nPlanes = 4)))
    val rLsh6 = recall(pairs(Similarity.lshTopK(emb, q, 5, nPlanes = 6)))
    val cents = Similarity.fitCentroids(emb)
    val rIvf4 = recall(pairs(Similarity.ivfTopK(emb, q, 5, nProbe = 4,
      centroids = Some(cents))))
    val rIvf8 = recall(pairs(Similarity.ivfTopK(emb, q, 5, nProbe = 8,
      centroids = Some(cents))))
    assert(rLsh4 >= rLsh6, s"fewer planes must not lose recall: $rLsh4 < $rLsh6")
    assert(rIvf8 >= rIvf4, s"wider probe must not lose recall: $rIvf8 < $rIvf4")
    assert(rIvf8 > 0 && rLsh4 > 0)
  }

  test("fitCentroids is deterministic: identical integer centroids across fits") {
    // the quantizer's SQL-reproducibility rests on every Lloyd number
    // being an exact integer: two independent distributed fits (new
    // shuffles, new partition orders) must agree bit-for-bit
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.fitCentroids(emb)
    val b = Similarity.fitCentroids(emb)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.length === 16)
    // probe-all covers the whole corpus: every vector ranks every
    // non-degenerate cell, so nProbe = nCentroids scans everything
    val ranks = Similarity.cellRanks(Array.fill(64)(1L), a)
    assert(ranks.toSet.size === ranks.length)
    assert(ranks.nonEmpty)
  }

  test("nearDupPairs (LSH) finds exact duplicates and verifies with exact cosine") {
    val base = Seq.tabulate(16)(i => math.sin(i * 3 + 1.0))
    val corpus = vecs(Seq.tabulate(10)(i =>
      (i.toLong, Seq.tabulate(16)(j => math.cos(i * 29 + j * 7)))) ++
      Seq((50L, base), (51L, base)): _*)
    val out = Similarity.nearDupPairs(corpus, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists(p => p._1 === 50L && p._2 === 51L && p._3 > 0.999),
      s"duplicate pair not found: ${out.toSeq}")
  }
}
