package graft.operators

import java.sql.Timestamp
import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics gates for last-touch attribution, MAD outliers, and the
  * streaming WAU twin: attribution edges on crafted sequences (the
  * fixture can't isolate horizon/ordering cases), MAD against a
  * driver-side brute force, and stream-vs-batch WAU equality.
  */
class AttributionMadSpec extends SparkFunSuite {

  private def day(d: Int, h: Int = 10) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  // same chain as EventAnalytics.lastTouchAttribution, over an injected frame
  private def attributed(rows: Seq[(Long, Long, String, Timestamp)]): Map[String, Long] = {
    val s = spark
    import s.implicits._
    val events = rows.map { case (u, id, t, ts) => (u, id, t, ts, 1.0) }
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("lt", last(
        when(col("event_type") =!= "purchase",
          struct(col("ts").as("t"), col("event_type").as("ch"))),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("lt").isNull ||
          col("lt.t") < col("ts") - expr("INTERVAL 7 DAYS"), lit("none"))
          .otherwise(col("lt.ch")))
      .groupBy("channel").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("attribution picks the LAST touch, honors the horizon, skips purchases") {
    val m = attributed(Seq(
      // u1: view then click then purchase -> click (last touch wins)
      (1L, 1L, "view", day(1)), (1L, 2L, "click", day(2)), (1L, 3L, "purchase", day(3)),
      // u2: touch 8 days before purchase -> outside horizon -> none
      (2L, 4L, "view", day(1)), (2L, 5L, "purchase", day(9)),
      // u3: first event is a purchase -> none; later purchase attributes
      // to the view, NOT to the intervening purchase
      (3L, 6L, "purchase", day(1)), (3L, 7L, "view", day(2)), (3L, 8L, "purchase", day(3))))
    assert(m == Map("click" -> 1L, "none" -> 2L, "view" -> 1L))
  }

  test("touch exactly at the horizon boundary is attributed (>= semantics)") {
    // touch at purchase_ts - 7 days exactly: lt.t < ts - 7d is false -> kept
    val m = attributed(Seq(
      (1L, 1L, "click", day(1)), (1L, 2L, "purchase", day(8))))
    assert(m == Map("click" -> 1L))
  }

  test("MAD outliers match a driver-side brute force per event type") {
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val out = Relational.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val vals = new graft.cube.Engine(spark, sf).table("events")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    vals.foreach { case (t, xs) =>
      val med = medianOf(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = medianOf(devs)
      val thresh = 3.0 * 1.4826 * mad
      val r = out(t)
      assert(r.getDouble(1) == BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getLong(3) == xs.length)
      assert(r.getLong(4) == devs.count(_ > thresh), s"type $t")
    }
  }

  test("streaming sliding WAU equals the batch expansion") {
    val stream = graft.streaming.EventsStream.slidingActiveUsers(spark, sf)
      .collect().map(r => (r.get(0), r.getLong(1))).toSeq
    val batch = EventAnalytics.rollingActiveUsers(spark, sf)
      .collect().map(r => (r.get(0), r.getLong(1))).toSeq
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
