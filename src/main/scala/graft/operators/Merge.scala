package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO (upsert / CDC-apply) as a batch operator — the lakehouse
  * state-maintenance primitive the reference's pandas pipeline has no
  * analogue for, but that any warehouse-scale deployment of its
  * pipelines needs (cite: reference keeps whole tables in Streamlit
  * session state and rewrites them in place, `/root/reference/app.py`;
  * at 100 TB the state lives as a keyed table and THIS is how a delta
  * lands on it).
  *
  * Semantics (MERGE INTO target USING source ON keys):
  *  - matched               → source row wins (SCD1 update) …
  *  - matched ∧ deleteWhen  → … unless the source row is a tombstone:
  *                            the key is dropped from the result;
  *  - not matched           → source row is inserted
  *                            (a tombstone for an absent key is a no-op);
  *  - not matched by source → target row is kept.
  *
  * Scale shape: ONE full-outer shuffle join on the merge keys — no
  * driver-side state, no collect. When the state table is bucketed by
  * the key (see `sources/Bucketing`), the target side's exchange
  * elides entirely and the merge cost is the delta's shuffle plus a
  * co-located join — the standard incremental-maintenance layout.
  */
object Merge {

  /** @param deleteWhen predicate over SOURCE columns marking tombstones. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             deleteWhen: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"target/source schemas differ: ${target.columns.mkString(",")} vs ${source.columns.mkString(",")}")
    val payload = target.columns.filterNot(keys.contains).toSeq
    val t = target.select(
      keys.map(col) :+ struct(payload.map(col): _*).as("__t"): _*)
    val del = deleteWhen.getOrElse(lit(false))
    val s = source.select(
      keys.map(col) ++ Seq(struct(payload.map(col): _*).as("__s"), del.as("__del")): _*)
    t.join(s, keys, "full_outer")
      .filter(!coalesce(col("__del"), lit(false)))
      .select(keys.map(col) ++ payload.map(c =>
        coalesce(col("__s").getField(c), col("__t").getField(c)).as(c)): _*)
  }
}
