package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Invariant gates for the q183–q187 batch. */
class BasketCohortSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  test("cohort LTV: cumulative revenue is non-decreasing within a cohort") {
    val rows = EventAnalytics.cohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (_, rs) =>
      val cums = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      cums.sliding(2).foreach {
        case Array(a, b) => assert(b >= a)
        case _ => ()
      }
    }
  }

  test("market basket finds a planted co-purchase pair with exact lift") {
    // 4 orders: parts (1,2) together 3x, part 3 alone once
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
    // replicate the operator body over an injected frame (the public op
    // is dir-wired)
    val partN = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    val orders = li.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairs = li.alias("a")
      .join(li.alias("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support")).filter(col("support") >= 3)
      .join(broadcast(partN.select(col("l_partkey").as("part_a"), col("n").as("n_a"))), "part_a")
      .join(broadcast(partN.select(col("l_partkey").as("part_b"), col("n").as("n_b"))), "part_b")
      .crossJoin(broadcast(orders))
      .select(col("part_a"), col("part_b"), col("support"),
        round((col("support") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")), 4).as("lift"))
      .collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 2L, 3L))
    assert(r.getDouble(3) == BigDecimal(3.0 * 4 / (3 * 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("supplier HHI is 1 for single-sourced parts and bounded below by 1/k") {
    val rows = Relational.supplierConcentration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avgHhi = r.getDouble(2)
      val avgSupp = r.getDouble(3)
      assert(avgHhi > 0.0 && avgHhi <= 1.0)
      assert(avgSupp >= 1.0)
    }
  }

  test("dow profile preserves the order count and covers at most 7 days") {
    val rows = Relational.dowProfile(spark, sf).collect()
    assert(rows.length <= 7)
    val nOrders = new graft.cube.Engine(spark, sf).table("orders").count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 6))
  }
}
