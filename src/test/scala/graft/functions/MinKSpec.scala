package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[MinK]] must equal sort-ascending-take-k on the group's value
  * multiset, independent of partitioning (the map-side compaction and
  * partial-merge paths must be value-transparent) — the q221 hot-block
  * cap inherits its determinism from this equivalence.
  */
class MinKSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def expect(vs: Seq[Long], k: Int): Seq[Long] = vs.sorted.take(k)

  test("minK equals sorted-take-k across group sizes, k, and partitionings") {
    for {
      n <- Seq(1, 7, 129, 1000)
      k <- Seq(1, 5, 128)
      parts <- Seq(1, 7)
    } {
      // deterministic scramble; duplicates included (multiplicity kept)
      val vs = (1 to n).map(i => ((i * 2654435761L) % 997).abs)
      val got = vs.toDF("v").repartition(parts)
        .agg(MinK.column(col("v"), k).as("mk"))
        .as[Seq[Long]].head()
      assert(got == expect(vs, k), s"n=$n k=$k parts=$parts")
    }
  }

  test("minK per group under a grouped aggregation") {
    val df = (1L to 500L).map(i => (i % 3, 1000L - i)).toDF("g", "v")
      .repartition(11)
    val got = df.groupBy(col("g"))
      .agg(MinK.column(col("v"), 4).as("mk"))
      .as[(Long, Seq[Long])].collect().toMap
    for (g <- 0L to 2L) {
      val vs = (1L to 500L).filter(_ % 3 == g).map(1000L - _)
      assert(got(g) == expect(vs, 4), s"g=$g")
    }
  }

  test("minK rejects k < 1") {
    intercept[IllegalArgumentException] { new MinK(0) }
  }
}
