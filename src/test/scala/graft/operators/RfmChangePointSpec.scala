package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Invariant gates for the q179–q182 batch: winsorize clamp accounting,
  * RFM partitioning, gap-stat ordering, and change-point optimality vs a
  * driver-side exhaustive scan.
  */
class RfmChangePointSpec extends SparkFunSuite {

  test("winsorize: clip counts are ~5% tails and the mean lies inside [p05,p95]") {
    Quality.winsorizeReport(spark, sf).collect().foreach { r =>
      val n = r.getLong(1)
      val (lo, hi) = (r.getLong(2), r.getLong(3))
      assert(lo <= n * 0.06 + 1 && hi <= n * 0.06 + 1, s"tails of ${r.getString(0)}")
      assert(r.getDouble(6) >= r.getDouble(4) && r.getDouble(6) <= r.getDouble(5))
    }
  }

  test("rfm: segments partition the customer base, scores in 1..4") {
    val rows = Relational.rfmSegments(spark, sf).collect()
    val nCust = new graft.cube.Engine(spark, sf).table("orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(s => assert(s >= 1 && s <= 4))
    }
  }

  test("order gaps: percentiles ordered, max bounds them") {
    val r = Relational.orderGapStats(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) <= r.getDouble(2))
    assert(r.getDouble(2) <= r.getLong(3).toDouble)
  }

  test("change point maximizes the mean shift over all splits (exhaustive check)") {
    val best = EventAnalytics.changePoint(spark, sf).head()
    val daily = new graft.cube.Engine(spark, sf).table("events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(round(sum(col("value")), 2).as("total"))
      .orderBy(col("day")).collect().map(_.getDouble(1))
    val n = daily.length
    val shifts = (1 until n).map { i =>
      val before = daily.take(i).sum / i
      val after = daily.drop(i).sum / (n - i)
      math.abs(before - after)
    }
    val bestShift = BigDecimal(shifts.max)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(best.getDouble(3) == bestShift)
  }
}
