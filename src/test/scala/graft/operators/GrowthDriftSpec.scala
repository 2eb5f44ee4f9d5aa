package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Invariant gates for the q188–q190 batch. */
class GrowthDriftSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  test("growth ledger: active = new + retained + resurrected every week") {
    val rows = EventAnalytics.growthAccounting(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"ledger identity at ${r.get(0)}")
      assert(r.getLong(5) >= 0, "churn cannot be negative")
    }
    // first week: everyone is new
    val first = rows.minBy(_.getAs[java.time.LocalDateTime]("week"))
    assert(first.getLong(1) == first.getLong(2))
  }

  test("behavior switch matrix partitions the both-halves user set") {
    val rows = EventAnalytics.behaviorSwitchers(spark, sf).collect()
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    val ev = new graft.cube.Engine(spark, sf).table("events")
    val bothHalves = ev.filter(col("ts") < cutoff).select("user_id").distinct()
      .intersect(ev.filter(col("ts") >= cutoff).select("user_id").distinct())
      .count()
    assert(rows.map(_.getLong(2)).sum == bothHalves)
  }

  test("char entropy of a uniform alphabet is ln(k)") {
    val docs = Seq((1L, "en", "abcd"), (2L, "en", "abcd")).toDF("doc_id", "lang", "text")
    val r = Corpus.charEntropy(docs).head()
    assert(r.getLong(1) == 8L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == BigDecimal(math.log(4.0))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
