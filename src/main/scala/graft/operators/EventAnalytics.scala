package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ordered-sequence event analytics: conversion funnels and cohort
  * retention. Absent in the reference (whose events surface stops at
  * calendar aggregation) — provided as first-class engine ops for the
  * product-analytics query family.
  *
  * Scale notes: the funnel's three conditional stage times are chained
  * window aggregates over the SAME `user_id` partitioning, so Catalyst
  * plans ONE exchange followed by consecutive Window nodes, and the
  * per-user collapse that follows reuses that partitioning (no second
  * shuffle). Retention pre-shrinks events to one row per (user, day) via
  * a map-side-combined `collect_set` (bounded by the calendar span, ~30
  * elements here) before any per-day work, so the big table is shuffled
  * once at user granularity rather than event granularity.
  */
object EventAnalytics {

  private val stages = Seq("view", "click", "purchase")

  /** Strictly-ordered conversion funnel view → click → purchase: a user
    * counts at stage k only if each stage-k event happened strictly after
    * their earliest qualifying stage-(k-1) event. Returns one row per
    * funnel stage with the surviving user count.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val events = new graft.cube.Engine(spark, dir).table("events")
    val w = Window.partitionBy(col("user_id"))
    val staged = events
      .withColumn("t1", min(when(col("event_type") === stages(0), col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === stages(1) && col("ts") > col("t1"),
        col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === stages(2) && col("ts") > col("t2"),
        col("ts"))).over(w))
    val perUser = staged
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    perUser
      .agg(count(col("t1")).as("v1"), count(col("t2")).as("v2"), count(col("t3")).as("v3"))
      .selectExpr(
        "stack(3, 'view', v1, 'view_click', v2, 'view_click_purchase', v3) AS (stage, users)")
      .orderBy(col("stage"))
  }

  /** Classic cohort retention: users grouped by their first active day,
    * counted on each later active day offset. One row per
    * (cohort_day, day_offset) with the distinct-user count.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val events = new graft.cube.Engine(spark, dir).table("events")
    val perUser = events
      .select(col("user_id"), date_trunc("day", col("ts"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("days"))
      .select(col("user_id"), array_min(col("days")).as("cohort_day"),
        explode(col("days")).as("day"))
    perUser
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast(LongType).as("day_offset"))
      .agg(count(lit(1)).as("users")) // (user, day) already distinct by construction
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
