package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cube.Engine

/** Batch MERGE / upsert: apply a change set onto a snapshot keyed by a
  * primary key — the warehouse `MERGE INTO` statement (update matched,
  * insert unmatched) as a composable DataFrame operator. The reference's
  * ETL re-downloads whole cubes (`oec.py:43`); an engine maintaining a
  * 100 TB snapshot applies deltas instead.
  *
  * Semantics: a key present in `changes` takes the CHANGE row wholesale
  * (including its NULL columns — presence is decided by the key, not by
  * value-level coalesce, so an update can legitimately null a field); a
  * key absent from `changes` keeps the snapshot row; a new key inserts.
  *
  * Scale shape: one full-outer shuffle join on the key — or none: when
  * both sides are bucketed by the key (`Sink.writeBucketed`) the merge is
  * a zero-exchange sort-merge, which is how a periodically-maintained
  * snapshot should be stored. The change set is typically ≪ snapshot, so
  * AQE will broadcast it and the snapshot is never shuffled at all.
  */
object Merge {

  /** Generic MERGE: full-outer on `keys`; change rows win wholesale. */
  def mergeUpsert(target: DataFrame, changes: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeUpsert needs at least one key column")
    require(target.columns.sameElements(changes.columns),
      s"schemas must match: ${target.columns.mkString(",")} vs " +
        changes.columns.mkString(","))
    val t = target.alias("t")
    // presence marker: the join is null-safe (<=>), so a NULL key is a
    // legitimate match — key nullability cannot stand in for "this row
    // came from the change side"; a non-nullable marker column can
    val c = changes.withColumn("__from_changes", lit(true)).alias("c")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"c.$k")).reduce(_ && _)
    val present = col("c.__from_changes").isNotNull
    val outCols = target.columns.map { name =>
      when(present, col(s"c.$name")).otherwise(col(s"t.$name")).as(name)
    }
    t.join(c, cond, "full_outer").select(outCols.toIndexedSeq: _*)
  }

  /** Fixture wiring (q81): snapshot = latest per-user event state before
    * the cutoff; changes = latest per-user state after it; merge yields
    * the maintained current-state table — identical to recomputing the
    * snapshot over the full log, which is exactly what the oracle does
    * NOT do (it merges the same two halves), proving the maintenance
    * path, while the q69 oracle already pins the full-recompute shape.
    */
  def latestStateMerge(spark: SparkSession, dir: String,
      cutoff: String = "2024-01-16 00:00:00"): DataFrame = {
    val ev = new Engine(spark, dir).table("events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
    def latest(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"))
    }
    val snapshot = latest(ev.filter(col("ts") < lit(cutoff).cast("timestamp_ntz")))
    val changes = latest(ev.filter(col("ts") >= lit(cutoff).cast("timestamp_ntz")))
    mergeUpsert(snapshot, changes, Seq("user_id"))
      .orderBy(col("user_id"))
  }
}
