package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Invariant gates for the monitoring trio (anomaly flags, funnel
  * latency, IDF drift) — the oracle pins exact values; these pin the
  * semantic edges that hold at any scale factor.
  */
class DriftAnomalySpec extends SparkFunSuite {

  test("daily anomalies: window sizes ramp 1..28 and day-1 is never anomalous") {
    val rows = EventAnalytics.dailyAnomalies(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      val expected = math.min(i + 1, 28)
      assert(r.getLong(3) == expected, s"window size at row $i")
    }
    // single-element window: sample std undefined -> flag must be false
    // (Spark yields NaN there, DuckDB NULL; both resolve to false)
    assert(!rows.head.getBoolean(4))
  }

  test("funnel timing counts exactly the strict converters and p50<=p90") {
    val t = EventAnalytics.funnelTiming(spark, sf).head()
    val funnelRow = EventAnalytics.funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t.getLong(0) == funnelRow("view_click_purchase"))
    assert(t.getDouble(1) <= t.getDouble(2))
    assert(t.getDouble(1) >= 0.0)
  }

  test("idf drift: one-sided tokens get the smoothed ceiling idf") {
    val en = new graft.cube.Engine(spark, sf)
    val docs = en.table("documents")
    val nA = docs.filter(col("doc_id") % 2 === 0).count()
    val nB = docs.filter(col("doc_id") % 2 =!= 0).count()
    val rows = Corpus.idfDrift(docs).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      val (dfA, dfB) = (r.getLong(1), r.getLong(2))
      def idf(n: Long, df: Long): Double =
        BigDecimal(math.log((n + 1.0) / (df + 1.0)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == idf(nA, dfA))
      assert(r.getDouble(4) == idf(nB, dfB))
    }
    // movers list is sorted by |drift| desc
    val drifts = rows.map(_.getDouble(5)).toSeq
    assert(drifts == drifts.sorted.reverse)
  }
}
