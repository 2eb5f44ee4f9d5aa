package graft

import org.apache.spark.sql.functions._

/** Proves AQE's runtime skew-join split actually engages under this
  * session's configuration — the runtime half of the skew strategy
  * ([[graft.operators.Skew]] salting is the planning-time half; GraftSession
  * enables `spark.sql.adaptive.skewJoin`). The fixture is tiny, so the
  * skew thresholds are lowered to make a deliberately hot key (one key
  * carrying ~90% of the fact side) cross them; the assertion is on the
  * executed plan: the sort-merge join must carry the `skew=true` marker,
  * i.e. AQE split the oversized partition instead of letting one task
  * drag the stage. Results must equal the unsplit join exactly — the
  * split is a physical re-plan, never a semantics change.
  */
class AqeSkewJoinSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime, results unchanged") {
    val conf = spark.conf
    val prior = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k))
    try {
      // force a shuffle join and make the hot partition detectable at
      // fixture scale: tiny skew threshold, tiny advisory target
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.shuffle.partitions", "8")

      // fact side: key 0 carries 90k of 100k rows; dim side: 100 keys
      val fact = spark.range(100000)
        .select(when(col("id") < 90000, 0L).otherwise(col("id") % 100)
          .as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("p"))
      val dim = spark.range(100)
        .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("d"))

      // collect() drives THIS queryExecution (count() would plan its own
      // and leave this one un-finalized, AQE never run)
      val joined = fact.join(dim, "k")
      val n = joined.collect().length
      assert(n == 100000, s"join lost rows under skew split: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1500)}")
    } finally prior.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
