package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiling harness — NOT part of the engine; deleted before
  * commit. Times sub-pipelines of a query under the bench session
  * config so hot stages can be attributed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        math.min(cpus.toInt, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val d = sfDir
    spark.range(0, 1000000, 1, 4).selectExpr("sum(id)").collect()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // ---- q_copurchase_edges: current vs shared-exchange ----
    def cpeA = {
      val pp = graft.sources.Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      pp.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(pp.select(col("l_orderkey").as("ok2"),
          col("l_partkey").as("p2")),
          col("l_orderkey") === col("ok2") && col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .orderBy(col("p1"), col("p2"))
    }
    def cpeB = {
      val pp = graft.sources.Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_partkey")).agg(count(lit(1)).as("__c")).drop("__c")
      pp.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(pp.select(col("l_orderkey").as("ok2"),
          col("l_partkey").as("p2")),
          col("l_orderkey") === col("ok2") && col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .orderBy(col("p1"), col("p2"))
    }

    // ---- q_assoc_rules digest: current arrays vs self-join ----
    def arA = graft.sources.Tables.load(s, d, "lineitem")
      .join(graft.sources.Tables.load(s, d, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("oid"), col("p_brand").as("brand"))
      .groupBy(col("oid")).agg(collect_set(col("brand")).as("arr"))
      .select(explode(expr(
        """concat(
          |  flatten(transform(arr, x ->
          |    transform(arr, y -> struct(x AS a, y AS b)))),
          |  array(struct('' AS a, '' AS b)))""".stripMargin)).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("c"))
    def arB = {
      val bl = graft.sources.Tables.load(s, d, "lineitem")
        .join(broadcast(graft.sources.Tables.load(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("oid"), col("p_brand").as("brand"))
        .repartition(col("oid"))
        .groupBy(col("oid"), col("brand")).agg(count(lit(1)).as("__c")).drop("__c")
      val pairs = bl.select(col("oid"), col("brand").as("a"))
        .join(bl.select(col("oid").as("oid2"), col("brand").as("b")),
          col("oid") === col("oid2"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      val n = bl.groupBy(col("oid")).agg(count(lit(1)).as("__c")).drop("__c")
        .select(lit("").as("a"), lit("").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      pairs.unionByName(n)
    }

    def time2(label: String, reps: Int)(f: => Unit): Seq[Double] = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label: ${ts.map(x => f"$x%.2f").mkString(",")} median ${ts.sorted.apply(reps / 2)}%.3f")
      ts
    }

    // warm
    noop(cpeA); noop(cpeB); { val r = arA.collect(); val r2 = arB.collect(); assert(r.map(x=>(x.getString(0),x.getString(1),x.getLong(2))).toSet == r2.map(x=>(x.getString(0),x.getString(1),x.getLong(2))).toSet, "assoc digest mismatch") }
    val a1 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b1 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val a2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 5) {
      var t0 = System.nanoTime(); noop(cpeA); a1 += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(cpeB); b1 += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); arA.collect(); a2 += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); arB.collect(); b2 += (System.nanoTime() - t0) / 1e9
    }
    def med(x: scala.collection.mutable.ArrayBuffer[Double]) = x.sorted.apply(2)
    println(f"[scratch] cpe A(current): ${a1.map(x => f"$x%.2f").mkString(",")} median ${med(a1)}%.3f")
    println(f"[scratch] cpe B(shared-exch): ${b1.map(x => f"$x%.2f").mkString(",")} median ${med(b1)}%.3f")
    println(f"[scratch] assoc A(arrays): ${a2.map(x => f"$x%.2f").mkString(",")} median ${med(a2)}%.3f")
    println(f"[scratch] assoc B(selfjoin): ${b2.map(x => f"$x%.2f").mkString(",")} median ${med(b2)}%.3f")

    spark.stop()
  }
}
