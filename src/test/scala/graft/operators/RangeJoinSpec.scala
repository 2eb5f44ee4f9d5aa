package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkFunSuite {

  test("banded range join equals the naive theta join on the fixture") {
    val banded = RangeJoin.nearbyEventCounts(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive reference: unbanded theta self-join (fine at fixture scale)
    val ev = new graft.cube.Engine(spark, sf).table("events")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val l = ev.select(col("event_id"), col("us"))
    val r = ev.select(col("event_id").as("r_id"), col("us").as("r_us"))
    val naive = l.join(r,
        col("r_id") =!= col("event_id") &&
          abs(col("r_us") - col("us")) <= 60000000L, "left_outer")
      .groupBy("event_id").agg(count(col("r_id")).as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(banded == naive)
    assert(banded.values.sum > 0)
  }

  test("approx percentiles land within rank tolerance of exact") {
    val approx = Relational.approxPricePercentiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = new graft.cube.Engine(spark, sf).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.45, 0.55))").as("b50"),
        expr("percentile(l_extendedprice, array(0.93, 0.97))").as("b95"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    // the sketch's 0.1% rank error is far inside these +/-2-5% rank bands
    approx.foreach { case (flag, (p50, p95)) =>
      val (b50, b95) = exact(flag)
      assert(p50 >= b50.head && p50 <= b50.last, s"$flag p50=$p50 not in $b50")
      assert(p95 >= b95.head && p95 <= b95.last, s"$flag p95=$p95 not in $b95")
    }
  }

  test("pivot columns partition the total quantity") {
    val p = Relational.returnFlagPivot(spark, sf)
    val total = p.select((coalesce(col("qty_a"), lit(0.0)) +
      coalesce(col("qty_n"), lit(0.0)) +
      coalesce(col("qty_r"), lit(0.0))).as("t"))
      .agg(sum(col("t"))).collect().head.getDouble(0)
    val expected = new graft.cube.Engine(spark, sf).table("lineitem")
      .agg(sum(col("l_quantity"))).collect().head.getDouble(0)
    assert(total == expected)
  }
}
