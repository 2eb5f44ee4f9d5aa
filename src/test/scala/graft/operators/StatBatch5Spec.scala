package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics for the q313–q318 batch: seasonal indices summing to
  * ~zero, repetition-ratio ranges, k-core peel monotonicity and
  * convergence, cycle-time non-negativity, padding-waste bounds, and
  * dwell-matrix conservation — cases the fixture-scale oracle equality
  * can't isolate.
  */
class StatBatch5Spec extends SparkFunSuite {

  test("STL weekday seasonal indices are mean-detrended (sum near zero)") {
    val out = Relational.stlWeekdayDecomposition(spark, sf).collect()
    assert(out.length == 7)
    // seasonal components of a detrended series cancel weighted by day
    // counts (up to MA edge effects — loose bound, dollars)
    val weighted = out.map(r => r.getDouble(2) * r.getLong(1)).sum
    val mass = out.map(r => math.abs(r.getDouble(2)) * r.getLong(1)).sum
    assert(mass == 0.0 || math.abs(weighted) < math.max(mass * 0.05, 1.0))
    out.foreach(r => assert(r.getDouble(3) >= 0))
  }

  test("repetition ratios stay in their (0, 1] ranges") {
    val out = Corpus.repetitionProfile(
      new graft.cube.Engine(spark, sf).table("documents")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    }
  }

  test("k-core peel removals are monotone to convergence") {
    val out = Graph.docKCore(spark, sf).collect()
    assert(out.length == 3)
    // active node count never grows round over round
    val nodes = out.map(_.getLong(1))
    assert(nodes.sliding(2).forall(p => p(1) <= p(0)))
    // removing r nodes leaves at least n - r active (edges may drop more)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1) - a.getLong(2))
    }
    // fixture converges: final round removes nothing
    assert(out.last.getLong(2) == 0L)
  }

  test("order cycle stats are sane and line counts conserve") {
    val out = Relational.orderCycleByMonth(spark, sf).collect()
    val en = new graft.cube.Engine(spark, sf)
    val joined = en.table("lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")).cast("long").as("d"))
    assert(out.map(_.getLong(1)).sum == joined.count())
    // month means (fixture dates are uncorrelated, so signs vary)
    // reconcile exactly to the global mean when re-weighted by n_lines
    val globalMean = joined.agg(avg(col("d"))).head.getDouble(0)
    val weighted = out.map(r => r.getDouble(2) * r.getLong(1)).sum /
      out.map(_.getLong(1)).sum
    assert(math.abs(weighted - globalMean) < 1e-4)
    out.foreach { r =>
      // p95 is an order stat: at most 5% of a month's lines exceed it,
      // so a month with late30_rate > 0.05 must have p95 > 30
      if (r.getDouble(4) > 0.05) assert(r.getDouble(3) > 30.0)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0)
    }
  }

  test("aspect buckets conserve assets with padding waste in [0, 1)") {
    val docs = new graft.cube.Engine(spark, sf).table("documents")
    val out = graft.multimodal.Multimodal.aspectBuckets(docs).collect()
    assert(out.map(_.getLong(1)).sum == docs.count())
    out.foreach { r =>
      assert(r.getDouble(4) >= 0 && r.getDouble(4) < 1.0)
      // every bucket's max dims bound the quantized ratio
      val bucket = r.getLong(0)
      assert(bucket >= 10L * 16 / 63 && bucket <= 10L * 79 / 16)
    }
  }

  test("transition dwell matrix conserves lagged events and keeps order stats sane") {
    val out = EventAnalytics.transitionDwell(spark, sf).collect()
    val ev = new graft.cube.Engine(spark, sf).table("events")
    val users = ev.select(col("user_id")).distinct().count()
    // every event except each user's first contributes one transition
    assert(out.map(_.getLong(2)).sum == ev.count() - users)
    out.foreach { r =>
      assert(r.getDouble(3) >= 0)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= r.getDouble(3) * 10 + 1)
    }
  }
}
