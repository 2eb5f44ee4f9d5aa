package graft.operators

import graft.{SparkEntry, SparkFunSuite}
import org.apache.spark.sql.functions._

/** Semantics gates for the round-10 relational additions: the two-stage
  * skyline must equal the quadratic dominance definition, islands must
  * actually partition and separate, argmax-as-aggregate must equal the
  * window formulation, and the WAU expansion must equal the brute-force
  * windowed distinct — each checked against the fixture, where the
  * brute-force formulations are still affordable.
  */
class SkylineIslandsSpec extends SparkFunSuite {

  test("pareto front equals the quadratic dominance definition") {
    val front = Relational.paretoCustomers(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: per-customer rollup, distinct points, all-pairs dominance
    val pts = new graft.cube.Engine(spark, sf).table("orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("s"), count(lit(1)).as("n"))
      .groupBy(col("s"), col("n")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (s, n, _) =>
      !pts.exists { case (s2, n2, _) =>
        s2 >= s && n2 <= n && (s2 > s || n2 < n) }
    }.toSet
    assert(front == brute)
    assert(front.nonEmpty)
  }

  test("skyline result is invariant to the bucket count") {
    val a = Relational.paretoCustomers(spark, sf, buckets = 1).collect().toSeq
    val b = Relational.paretoCustomers(spark, sf, buckets = 7).collect().toSeq
    assert(a == b)
  }

  test("order islands partition the orders and are separated by real gaps") {
    val islands = Relational.orderIslands(spark, sf).collect()
    val nOrders = new graft.cube.Engine(spark, sf).table("orders").count()
    assert(islands.map(_.getLong(4)).sum == nOrders)
    // within a customer: strictly increasing, non-touching intervals
    islands.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getAs[java.time.LocalDateTime]("island_end")
          val bStart = b.getAs[java.time.LocalDateTime]("island_start")
          assert(bStart.isAfter(aEnd), s"islands touch/overlap: $a | $b")
        case _ => ()
      }
      sorted.foreach { r =>
        assert(r.getAs[java.time.LocalDateTime]("island_start")
          .isBefore(r.getAs[java.time.LocalDateTime]("island_end")))
      }
    }
  }

  test("max_by argmax equals the window row_number formulation") {
    val viaAgg = Relational.nationTopCustomer(spark, sf).collect().toSeq
    val en = new graft.cube.Engine(spark, sf)
    val spend = en.table("orders").groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("spend").desc, col("c_custkey").desc)
    val viaWindow = spend
      .join(en.table("customer"), col("o_custkey") === col("c_custkey"))
      .join(en.table("nation"), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("n_name").as("nation"), col("c_custkey").as("best_custkey"),
        col("spend").as("best_spend"))
      .orderBy(col("nation")).collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("language entropy is 0 for monolingual sources and ln(k) for uniform") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mono", "en"), (2L, "mono", "en"), (3L, "mono", "en"),
      (4L, "bi", "en"), (5L, "bi", "de"),
      (6L, "tri", "en"), (7L, "tri", "de"), (8L, "tri", "fr"))
      .toDF("doc_id", "source", "lang")
    val out = Corpus.sourceLangMix(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("mono").getDouble(4) == 0.0)
    assert(out("mono").getDouble(3) == 1.0)
    assert(out("bi").getDouble(4) == BigDecimal(math.log(2.0))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("tri").getDouble(4) == BigDecimal(math.log(3.0))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("tri").getLong(2) == 3L)
  }

  test("rolling 7-day actives equals the brute-force windowed distinct") {
    val rolled = EventAnalytics.rollingActiveUsers(spark, sf).collect()
      .map(r => r.getAs[java.time.LocalDateTime]("win_day") -> r.getLong(1)).toMap
    val userDays = new graft.cube.Engine(spark, sf).table("events")
      .select(col("user_id"),
        date_trunc("day", col("ts"))
          .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("day")))
    rolled.foreach { case (day, n) =>
      val lo = day.minusDays(6)
      val brute = userDays.collect {
        case (u, d) if !d.isBefore(lo) && !d.isAfter(day) => u
      }.distinct.size
      assert(n == brute, s"win_day $day")
    }
    assert(rolled.nonEmpty)
  }
}
