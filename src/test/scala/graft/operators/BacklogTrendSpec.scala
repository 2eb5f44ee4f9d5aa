package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Invariant gates for the q200–q204 batch. */
class BacklogTrendSpec extends SparkFunSuite {

  test("brand top parts: every brand appears, ranks start at 1, ties kept") {
    val out = Relational.topPartsPerBrand(spark, sf).collect()
    val byBrand = out.groupBy(_.getString(0))
    byBrand.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).min == 1, "rank starts at 1")
      assert(rs.map(_.getInt(3)).max <= 3)
      // within a rank all revenues are equal (dense_rank tie semantics)
      rs.groupBy(_.getInt(3)).foreach { case (_, tied) =>
        assert(tied.map(_.getDouble(2)).distinct.size == 1)
      }
    }
  }

  test("norm dup rate: distinct_norm <= distinct_raw <= n_docs") {
    Corpus.normDupRate(new graft.cube.Engine(spark, sf).table("documents"))
      .collect().foreach { r =>
        assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1))
        assert(r.getLong(5) == r.getLong(2) - r.getLong(3))
      }
  }

  test("order backlog: every order contributes at least its order month") {
    val en = new graft.cube.Engine(spark, sf)
    val out = Relational.openOrderBacklog(spark, sf).collect()
    val nOrders = en.table("orders")
      .join(en.table("lineitem"), col("o_orderkey") === col("l_orderkey"),
        "left_semi").count()
    assert(out.map(_.getLong(1)).sum >= nOrders, "month-expansion >= orders")
    assert(out.map(_.getLong(1)).max > 0)
  }

  test("revenue trend: trailing mean equals hand-rolled window") {
    val rows = Relational.revenueTrend(spark, sf).collect()
      .sortBy(_.getAs[java.time.LocalDateTime](0).toString)
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = rows.slice(math.max(0, i - 11), i + 1).map(_.getDouble(1))
      val want = BigDecimal(frame.sum / frame.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - want) < 1e-9, s"row $i trailing mean")
    }
  }

  test("label separation: endpoint counts reconcile and means bounded") {
    val emb = new graft.cube.Engine(spark, sf).table("embeddings")
    val out = Similarity.labelSeparation(emb, maxId = 128L).collect()
    assert(out.nonEmpty)
    // each unordered pair contributes 2 endpoint rows: totals must equal
    // 2 * C(128, 2)
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == 128L * 127L)
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(math.abs(r.getDouble(3)) <= 1.0 && math.abs(r.getDouble(4)) <= 1.0)
      assert(math.abs(r.getDouble(5) -
        (BigDecimal(r.getDouble(3)) - BigDecimal(r.getDouble(4))).toDouble)
        < 1e-9)
    }
  }
}
