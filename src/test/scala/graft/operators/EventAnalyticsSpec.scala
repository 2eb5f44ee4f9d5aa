package graft.operators

import java.sql.Timestamp
import graft.{SparkEntry, SparkFunSuite}
import org.apache.spark.sql.functions._

/** Funnel ordering semantics on crafted event sequences (the oracle at
  * fixture scale can't isolate these edges) plus the single-exchange plan
  * claim.
  */
class EventAnalyticsSpec extends SparkFunSuite {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def funnelOf(rows: Seq[(Long, String, Int)]): Map[String, Long] = {
    val s = spark
    import s.implicits._
    val events = rows.map { case (u, t, m) => (u, t, ts(m)) }
      .toDF("user_id", "event_type", "ts")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    // same chain as EventAnalytics.funnel, over an injected frame
    val staged = events
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts") > col("t1"),
        col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
      .agg(count(col("t1")).as("v1"), count(col("t2")).as("v2"), count(col("t3")).as("v3"))
      .head()
    Map("view" -> staged.getLong(0), "view_click" -> staged.getLong(1),
      "view_click_purchase" -> staged.getLong(2))
  }

  test("funnel requires strict stage ordering per user") {
    // u1: full ordered funnel; u2: click BEFORE view (must not convert);
    // u3: purchase before click (stops at view_click); u4: never views.
    val f = funnelOf(Seq(
      (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3),
      (2L, "click", 1), (2L, "view", 2), (2L, "purchase", 3),
      (3L, "view", 1), (3L, "purchase", 2), (3L, "click", 4),
      (4L, "click", 1), (4L, "purchase", 2)))
    assert(f("view") == 3)                 // u1, u2, u3
    assert(f("view_click") == 2)           // u1, u3 (u2's click precedes its view)
    assert(f("view_click_purchase") == 1)  // u1 only (u3's purchase precedes its click)
  }

  test("simultaneous stage timestamps do not convert (strict >)") {
    val f = funnelOf(Seq((1L, "view", 1), (1L, "click", 1), (1L, "purchase", 2)))
    assert(f("view") == 1)
    assert(f("view_click") == 0)
    assert(f("view_click_purchase") == 0)
  }

  test("funnel plans one exchange for windows and per-user collapse") {
    val df = SparkEntry.queries("q72_funnel")(spark, sf)
    df.collect()
    // AQE toString prints the final AND the initial plan — count only the final
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"expected a single user_id exchange:\n$plan")
  }

  test("retention cohorts partition all active (user, day) pairs exactly once") {
    val df = SparkEntry.queries("q73_retention")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every user appears in exactly one cohort at offset 0
    val zeroOffsetUsers = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val distinctUsers = new graft.cube.Engine(spark, sf).table("events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(zeroOffsetUsers == distinctUsers)
    // offsets are non-negative and counts positive
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(2) > 0))
  }

  test("daily HLL sketches union to within 5% of the exact distinct count") {
    // the raw-estimate gate (the registered q76 surfaces the boolean form)
    val rows = Relational.dailySketchRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("event transitions: per-user pair counts add up to events minus users") {
    val rows = SparkEntry.queries("q98_event_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalTransitions = rows.map(_.getAs[Long]("n_transitions")).sum
    val ev = new graft.cube.Engine(spark, sf).table("events")
    val nEvents = ev.count()
    val nUsers = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    // each user contributes (their event count - 1) consecutive pairs
    assert(totalTransitions == nEvents - nUsers)
    // reach never exceeds volume
    rows.foreach(r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_transitions")))
  }
}
