package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkFunSuite

/** Runs the stateful streaming paths on the RocksDB state store — the
  * provider a 100 TB deployment uses (HDFS-backed in-memory state maps
  * are bounded by executor heap; RocksDB spills state to local disk and
  * checkpoints changelogs, which is what keeps week-long windowed/
  * session state alive at production key cardinalities). The engine's
  * operators must be provider-agnostic: identical results, provider
  * verifiably engaged (its metrics appear in the query progress).
  * Provider is a per-query conf read at start, so setting it around
  * `start()` scopes it to these queries; the suite restores the prior
  * value either way.
  */
class RocksDbStateSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("watermarked windowed agg on RocksDB state: same emissions, provider engaged") {
    withRocksDb {
      val input = MemoryStream[(Timestamp, Double)](spark)
      val agg = input.toDF().toDF("ts", "value")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .select(col("window.start").as("ws"), col("n"), col("total"))
      val q = agg.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("rocks_wm").start()
      try {
        input.addData((ts("10:01"), 1.0), (ts("10:03"), 2.0), (ts("10:07"), 3.0))
        q.processAllAvailable()
        assert(spark.table("rocks_wm").count() == 0)
        input.addData((ts("11:00"), 9.0))
        q.processAllAvailable()
        val emitted = spark.table("rocks_wm").collect()
        assert(emitted.length == 1)
        assert(emitted.head.getLong(1) == 3 && emitted.head.getDouble(2) == 6.0)
        // late data still dropped behind the watermark
        input.addData((ts("10:02"), 100.0))
        q.processAllAvailable()
        assert(spark.table("rocks_wm").count() == 1)
        // the provider must actually be RocksDB, not silently defaulted:
        // its custom metrics are namespaced "rocksdb*"
        val metrics = q.recentProgress.flatMap(_.stateOperators)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        assert(metrics.exists(_.startsWith("rocksdb")),
          s"no rocksdb state metrics in progress — provider not engaged: ${
            metrics.distinct.mkString(",")}")
      } finally q.stop()
    }
  }

  test("mapGroupsWithState sessionization on RocksDB state: same sessions as default store") {
    withRocksDb {
      val input = MemoryStream[(Long, Timestamp, Double)](spark)
      val sessions = EventsStream.sessionize(
        input.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30)
      val q = sessions.toDF().writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("rocks_sess").start()
      try {
        input.addData((7L, ts("10:00"), 1.0), (7L, ts("10:10"), 2.0),
          (9L, ts("10:00"), 5.0))
        q.processAllAvailable()
        assert(spark.table("rocks_sess").count() == 0)
        input.addData((9L, ts("12:00"), 7.0))
        q.processAllAvailable()
        val got = spark.table("rocks_sess")
          .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
        // identical emissions to StreamSemanticsSpec's default-store run
        assert(got == Set((9L, 1L, 5.0), (7L, 2L, 3.0)))
        val metrics = q.recentProgress.flatMap(_.stateOperators)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        assert(metrics.exists(_.startsWith("rocksdb")),
          "provider not engaged for the mapGroupsWithState path")
      } finally q.stop()
    }
  }
}
