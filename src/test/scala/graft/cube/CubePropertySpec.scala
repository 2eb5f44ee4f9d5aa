package graft.cube

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The SURVEY §5.3 property checks over the cube engine, run against the
  * real fixture with a seeded generator (deterministic trials, honest
  * coverage of the drilldown/cut lattice).
  *
  * Partition-sum invariant: for ANY drilldown subset and cut, the
  * grouped EXACT measures (Quantity, Line Count — integer-valued, no
  * rounding) must re-aggregate to the global totals under the same cut.
  * This is the invariant a dimension-join fan-out bug breaks: if any dim
  * join duplicated fact rows (a bad key, a missing rename, a lost
  * broadcast dedup), some drilldown subset would over-count — and no
  * single-query oracle would say which.
  */
class CubePropertySpec extends SparkFunSuite {

  private val exactMeasures = Seq("Quantity", "Line Count")

  test("partition-sum invariant over random drilldown subsets and cuts") {
    val eng = new Engine(spark, sf)
    // pool spans every join branch: calendar, orders, customer->nation->
    // region, part, supplier->nation->region, and fact-local levels
    val pool = Vector("Year", "Month", "Order Status", "Mkt Segment",
      "Nation", "Region", "Brand", "Part Size", "Supplier Nation",
      "Supplier Region", "Return Flag", "Line Status")
    val cutPool = Vector(
      Map.empty[String, Seq[String]],
      Map("Year" -> Seq("1995")),
      Map("Region" -> Seq("ASIA", "EUROPE")),
      Map("Return Flag" -> Seq("R")),
      Map("Year" -> Seq("1995", "1996"), "Mkt Segment" -> Seq("BUILDING")))
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val dds = rnd.shuffle(pool).take(1 + rnd.nextInt(3))
      val cuts = cutPool(rnd.nextInt(cutPool.size))
      // Quantity is a double-valued sum of integer-valued quantities —
      // exact in IEEE double far below 2^53, so == is the right compare
      val grouped = eng.getData(CubeQuery("trade", dds, exactMeasures, cuts))
        .agg(sum(col("quantity")).as("q"), sum(col("line_count")).as("c"))
        .head()
      val global = eng.getData(CubeQuery("trade", Seq.empty, exactMeasures, cuts))
        .head()
      assert(grouped.getDouble(0) == global.getDouble(0) &&
        grouped.getLong(1) == global.getLong(1),
        s"trial $trial: drilldowns=$dds cuts=$cuts grouped=$grouped global=$global")
    }
  }

  test("members equal the distinct drilldown values, for every trade level") {
    val eng = new Engine(spark, sf)
    for (level <- Seq("Nation", "Region", "Return Flag", "Order Status")) {
      val norm = Normalize.norm(level)
      // members frame carries the reference's ID column shape (oec.py:22)
      val members = eng.getMembers("trade", level)
        .select(col("id")).collect().map(_.get(0)).toSeq
      val viaData = eng.getData(CubeQuery("trade", Seq(level), Seq("Line Count")))
        .select(col(norm)).collect().map(_.get(0)).toSet
      // same set, and members are sorted + distinct
      assert(members.toSet == viaData, s"level $level")
      assert(members == members.distinct.sortBy(_.toString), s"level $level ordering")
    }
  }
}
