package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** MERGE INTO semantics: all four branches (update / insert / keep /
  * delete) pinned on a table small enough to eyeball, plus the
  * exactness law merge(state, delta) == recompute that the driver
  * queries `q_merge_upsert` / `q_merge_cdc` grade at scale. */
class MergeSpec extends GraftSpec {

  import spark.implicits._

  private def t = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "tag", "v")

  test("upsert: matched updates, unmatched-source inserts, unmatched-target keeps") {
    val s = Seq((2L, "B", 22.0), (4L, "d", 40.0)).toDF("k", "tag", "v")
    val out = Merge.upsert(t, s, Seq("k")).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 10.0), (2L, "B", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("tombstones: matched delete removes the key; absent-key tombstone is a no-op") {
    val s = Seq((2L, "DEL", 0.0), (4L, "d", 40.0), (5L, "DEL", 0.0))
      .toDF("k", "tag", "v")
    val out = Merge.upsert(t, s, Seq("k"),
        deleteWhen = Some(col("tag") === "DEL"))
      .orderBy("k").collect()
    // 2 deleted, 4 inserted, 5 (absent tombstone) ignored, 1/3 kept
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
  }

  test("source wins on EVERY payload column at once") {
    val s = Seq((1L, "A2", 11.0)).toDF("k", "tag", "v")
    val r = Merge.upsert(t, s, Seq("k")).filter(col("k") === 1).head()
    assert(r.getString(1) === "A2" && r.getDouble(2) === 11.0)
  }

  test("schema mismatch is rejected eagerly") {
    val s = Seq((1L, "x")).toDF("k", "tag")
    intercept[IllegalArgumentException] {
      Merge.upsert(t, s, Seq("k"))
    }
  }

  test("exactness law: merge(state, delta) == recompute over the union") {
    // state = latest per key from the first half, delta from the second;
    // merged must equal latest per key over everything (delta ts newer)
    val all = (1L to 40L).map(i => (i % 7, i, s"e$i")).toDF("k", "seq", "tag")
    val latest = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy("k").agg(max_by(struct(col("seq"), col("tag")), col("seq")).as("r"))
      .select(col("k"), col("r.seq").as("seq"), col("r.tag").as("tag"))
    val state = latest(all.filter(col("seq") <= 20))
    val delta = latest(all.filter(col("seq") > 20))
    val merged = Merge.upsert(state, delta, Seq("k"))
    assert(merged.exceptAll(latest(all)).isEmpty &&
      latest(all).exceptAll(merged).isEmpty)
  }
}
