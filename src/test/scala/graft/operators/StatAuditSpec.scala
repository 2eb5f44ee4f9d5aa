package graft.operators

import graft.SparkFunSuite
import graft.cube.Engine
import org.apache.spark.sql.functions._

/** Invariant gates for the q205–q220 statistical / curation-audit batch.
  * These pin mathematical properties the oracle hash cannot express
  * directly (monotonicity, bounds, conservation) plus the plan shapes
  * the scale design claims.
  */
class StatAuditSpec extends SparkFunSuite {

  private def en = new Engine(spark, sf)

  test("important suppliers: every survivor exceeds 1.05x the mean share") {
    val perSup = en.table("lineitem")
      .join(en.table("supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"))
      .agg(round(sum(col("l_extendedprice")) * 100, 0).cast("long").as("c"))
      .collect()
    val total = perSup.map(_.getLong(1)).sum
    val n = perSup.length
    val out = Relational.importantSuppliers(spark, sf).collect()
    out.foreach { r =>
      val cents = math.round(r.getDouble(2) * 100)
      assert(BigInt(cents) * n * 100 > BigInt(105) * total,
        s"supplier ${r.getLong(0)} below threshold")
    }
    // survivors are exactly the suppliers above the threshold
    val expected = perSup.count(r => BigInt(r.getLong(1)) * n * 100 > BigInt(105) * total)
    assert(out.length == expected)
  }

  test("weighted median lies within the brand's price range and splits weight") {
    val out = Relational.weightedMedianPrice(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val rows = en.table("lineitem")
      .join(en.table("part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      val (med, tw) = out(brand)
      assert(tw == rs.map(_._3).sum.toLong, s"$brand total weight")
      assert(med >= rs.map(_._2).min && med <= rs.map(_._2).max)
      // weight at or below the median reaches half the total
      val below = rs.filter(_._2 <= med).map(_._3).sum
      assert(below * 2 >= tw.toDouble, s"$brand median splits weight")
    }
  }

  test("benford digits: nine rows, observed shares sum to one") {
    val out = Relational.benfordOrders(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9))
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    // Benford expectation column is the closed form
    out.foreach { r =>
      val d = r.getInt(0)
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-6)
    }
  }

  test("autocorrelation coefficients are in [-1, 1] for both lags") {
    val out = Relational.dailyAutocorr(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSet == Set(1, 7))
    out.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }

  test("reorder survival is a valid non-increasing survivor function") {
    val out = Relational.reorderSurvival(spark, sf).collect()
    val surv = out.map(_.getDouble(3))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    surv.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, "survival must not increase")
      case _ =>
    }
    // risk set starts at the total number of gaps and strictly shrinks
    val risks = out.map(_.getLong(1))
    risks.sliding(2).foreach {
      case Array(a, b) => assert(b < a)
      case _ =>
    }
    assert(risks.head == out.map(_.getLong(2)).sum)
  }

  test("EWMA stays inside the window's envelope and never plans a BNLJ") {
    val df = Relational.dailyEwma(spark, sf)
    val rows = df.collect()
    df.queryExecution // materialized above
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the band must be explode + equi-join, not an inequality join")
    assert(!plan.contains("CartesianProduct"))
    def epochDay(r: org.apache.spark.sql.Row) =
      r.getAs[java.time.LocalDateTime](0).toLocalDate.toEpochDay
    val byDay = rows.map(r => epochDay(r) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = epochDay(r)
      val window = (0 to 6).flatMap(k => byDay.get(t - k))
      assert(r.getDouble(2) >= window.min - 1e-6 &&
        r.getDouble(2) <= window.max + 1e-6)
    }
  }

  test("chi-square cells conserve totals and are non-negative") {
    val out = Relational.segmentPriorityChisq(spark, sf).collect()
    assert(out.forall(_.getDouble(4) >= 0.0))
    val obs = out.map(_.getLong(2)).sum
    val exp = out.map(_.getDouble(3)).sum
    assert(math.abs(exp - obs) < 1e-3, "expected counts conserve the total")
  }

  test("mutual information is non-negative in aggregate") {
    val out = Relational.segmentPriorityMi(spark, sf).collect()
    assert(out.map(_.getDouble(2)).sum >= -1e-9)
  }

  test("order overlap histogram counts every multi-order-overlap customer once") {
    val out = Relational.orderOverlapHistogram(spark, sf).collect()
    assert(out.forall(r => r.getLong(0) > 0 && r.getLong(1) > 0))
    val nCustomers = out.map(_.getLong(1)).sum
    assert(nCustomers <= en.table("customer").count())
  }

  test("price elasticity covers every brand with its full lineitem count") {
    val out = Relational.priceElasticity(spark, sf).collect()
    val liCount = en.table("lineitem")
      .join(en.table("part"), col("l_partkey") === col("p_partkey")).count()
    assert(out.map(_.getLong(1)).sum == liCount)
  }

  test("length ANOVA: eta2 in [0,1] and SS decomposition orders correctly") {
    val r = Corpus.docLengthAnova(en.table("documents")).collect().head
    assert(r.getLong(2) >= r.getLong(3), "ss_total >= ss_between")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("dedup savings: kept subsets never exceed totals, rates in [0,1]") {
    val docs = en.table("documents")
    val out = Corpus.dedupTokenSavings(docs,
      Dedup.keepList(docs, Dedup.minhashPairsShared(docs, sf))).collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_kept <= n_docs")
      assert(r.getLong(4) <= r.getLong(3), "tokens_kept <= tokens_total")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // whole-corpus conservation against the raw doc count
    assert(out.map(_.getLong(1)).sum == docs.count())
  }

  test("sqrt allocation respects the budget and the per-source caps") {
    val out = Corpus.sqrtBudgetAllocation(en.table("documents")).collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "alloc <= available tokens")
      assert(r.getDouble(3) <= 1.0 && r.getDouble(3) > 0.0)
    }
    assert(out.map(_.getLong(2)).sum <= 500000L,
      "total allocation stays within budget")
  }

  test("ngram novelty rates are valid probabilities and every gram debuts once") {
    val out = Corpus.ngramNovelty(en.table("documents")).collect()
    out.foreach(r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))
  }

  test("global percentiles: ordered, exact-rank, no single-partition window") {
    val df = Relational.globalPricePercentiles(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the distributed rank must not degrade to a global window sort
    assert(!plan.contains("row_number("),
      "q252 must rank positionally, not via a row_number window")
    // the only single-partition work allowed is the one-row-per-partition
    // COUNT frame (planned once for the rank offsets and once for the
    // total) — the ranked fact itself must never collapse
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 2,
      "only the bounded per-partition count frames may single-partition")
    assert(plan.contains("HashAggregate(keys=[__pid"),
      "the SinglePartition subtrees must be the per-partition count frame")
    val byP = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byP.keySet == Set("p50", "p90", "p99"))
    assert(byP("p50") <= byP("p90") && byP("p90") <= byP("p99"))
    // rank targets are percentile_disc: value at ceil(p*n)
    val n = new Engine(spark, sf).table("lineitem").count()
    val ranks = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("p50") == (50 * n + 99) / 100)
    assert(ranks("p99") == (99 * n + 99) / 100)
  }

  test("centroid drift: cosine bounded, halves partition each label") {
    val emb = en.table("embeddings")
    val out = Similarity.centroidDrift(emb).collect()
    val sizes = emb.groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
      assert(r.getLong(1) + r.getLong(2) == sizes(r.getInt(0)),
        "even + odd halves must partition the label")
    }
  }
}
