package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private val li = spark.read.parquet(s"$sf/lineitem.parquet")
  private val sup = spark.read.parquet(s"$sf/supplier.parquet")

  test("bloomSemiJoin result equals the plain left-semi join") {
    val small = sup.filter(col("s_nationkey") === 3).select(col("s_suppkey"))
    val bloomed = RuntimeFilter.bloomSemiJoin(li, "l_suppkey", small, "s_suppkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = li.join(small.withColumnRenamed("s_suppkey", "l_suppkey"),
        Seq("l_suppkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bloomed == plain && plain.nonEmpty)
  }

  test("bloom pre-filter runs before the semi join's exchange") {
    val small = sup.filter(col("s_nationkey") === 3).select(col("s_suppkey"))
    val plan = RuntimeFilter.bloomSemiJoin(li, "l_suppkey", small, "s_suppkey")
      .queryExecution.executedPlan.toString
    // the probe side must be filtered by might_contain below/before any
    // exchange introduced by the final semi join
    assert(plan.contains("might_contain"))
    val mcIdx = plan.indexOf("might_contain")
    assert(mcIdx >= 0)
  }

  test("empty build side prunes everything") {
    val none = sup.filter(col("s_suppkey") < 0).select(col("s_suppkey"))
    assert(RuntimeFilter.bloomSemiJoin(li, "l_suppkey", none, "s_suppkey").isEmpty)
  }
}
