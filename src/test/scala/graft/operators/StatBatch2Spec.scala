package graft.operators

import java.sql.Timestamp
import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics for the q274–q280 statistics batch: Spearman's
  * monotone invariance and tie handling, the Theil decomposition
  * identity, Hill/attribution/burstiness boundary values — cases the
  * fixture-scale oracle equality can't isolate.
  */
class StatBatch2Spec extends SparkFunSuite {

  test("spearman is exactly ±1 on monotone (even nonlinear) data and handles ties") {
    val s = spark
    import s.implicits._
    // y = x³ is nonlinear but strictly monotone → Spearman exactly 1
    // (Pearson on the same data would be < 1); 'down' reverses → −1
    val up = (1 to 20).map(i => ("up", i, math.pow(i.toDouble, 3)))
    val down = (1 to 20).map(i => ("down", i, -math.pow(i.toDouble, 3)))
    // 'tied': all x equal → zero rank variance → group EXCLUDED
    val tied = (1 to 5).map(i => ("tied", 7, i.toDouble))
    val out = Relational.spearmanOf(
      (up ++ down ++ tied).toDF("p_type", "p_size", "p_retailprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("up") == 1.0 && out("down") == -1.0)
    assert(!out.contains("tied"))
  }

  test("theil decomposition: within + between sums to the total Theil index") {
    val rows = Relational.theilByNation(spark, sf).collect()
    // recompute the total directly from the same per-customer frame
    val en = new graft.cube.Engine(spark, sf)
    val perCust = en.table("orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
      .filter(col("cents") > 0)
      .join(en.table("customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val stats = perCust.agg(count(lit(1)).cast("double").as("n"),
      sum(col("cents")).cast("double").as("s")).head()
    val (n, tot) = (stats.getDouble(0), stats.getDouble(1))
    val mu = tot / n
    val tTotal = perCust.select(
      sum((col("cents") / mu) * log(col("cents") / mu)).as("t"))
      .head().getDouble(0) / n
    // Σ s_g·T_g + Σ between_g = T_total (additive decomposition)
    val decomposed = rows.map(r =>
      r.getDouble(2) * r.getDouble(3) + r.getDouble(4)).sum
    assert(math.abs(decomposed - tTotal) < 1e-4,
      s"decomposed=$decomposed total=$tTotal")
  }

  test("activity tail index is positive and tail is a subset of users") {
    val r = EventAnalytics.activityTailIndex(spark, sf).head()
    assert(r.getLong(1) <= r.getLong(0)) // n_tail <= n_users
    assert(r.getDouble(3) > 1.0)         // Hill alpha > 1 by construction
  }

  test("attribution models conserve purchases across channels") {
    val rows = EventAnalytics.attributionCompare(spark, sf).collect()
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == purchases) // first-touch total
    assert(rows.map(_.getLong(3)).sum == purchases) // last-touch total
    // purchase can never be its own touch channel
    assert(!rows.map(_.getString(0)).contains("purchase"))
  }

  test("burstiness is exactly -1 for periodic arrivals and bounded in (-1,1)") {
    val s = spark
    import s.implicits._
    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // u1 'tick': perfectly periodic 60s gaps → σ=0 → B = −1
    // u2 'burst': gaps 1s,1s,1s,597s → bursty, B > 0
    val periodic = (0 until 10).map(i => (1L, ts(i * 60), i.toLong, "tick"))
    val bursty = Seq(0, 1, 2, 3, 600).zipWithIndex.map { case (sec, i) =>
      (2L, ts(sec), 100L + i, "burst")
    }
    val out = EventAnalytics.interArrivalBurstinessOf(
      (periodic ++ bursty).toDF("user_id", "ts", "event_id", "event_type"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("tick") == -1.0)
    assert(out("burst") > 0.0 && out("burst") < 1.0)
  }

  test("centroid matrix covers every label pair once with bounded cosines") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val k = emb.select(col("label")).distinct().count().toInt
    val rows = Similarity.centroidSimilarityMatrix(emb).collect()
    assert(rows.length == k * (k - 1) / 2)
    rows.foreach { r =>
      assert(r.getInt(0) < r.getInt(1))
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("markov stationary distribution stays normalized and strictly positive") {
    val rows = EventAnalytics.markovStationary(spark, sf).collect()
    val probs = rows.map(_.getDouble(1))
    assert(math.abs(probs.sum - 1.0) < 1e-6) // row-stochastic chain preserves mass
    probs.foreach(p => assert(p > 0.0))      // dense chain: no absorbing zero state
  }

  test("laspeyres index is exactly 1 in the base year") {
    val rows = Relational.laspeyresPriceIndex(spark, sf).collect()
    val byYear = rows.map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(byYear(1995) == 1.0) // base basket at base prices
    assert(rows.map(_.getLong(1)).forall(_ > 0))
  }

  test("semantic outliers: every member counted once, cosines to own centroid bounded") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val rows = Similarity.semanticOutliers(emb).collect()
    assert(rows.map(_.getLong(1)).sum == emb.count())
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))                 // outliers <= members
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("compressibility ratio is 1.0 for unique text and collapses for repeated text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("rep", "a" * 100),             // one distinct trigram "aaa" over 98
      ("uniq", "abcdefghij"),          // all 8 trigrams distinct
      ("tiny", "ab"))                  // < 3 chars — excluded
      .toDF("source", "text")
    val rows = Corpus.compressibility(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("uniq")._1 == 1.0 && rows("uniq")._2 == 0.0)
    assert(rows("rep")._1 == 0.010204 && rows("rep")._2 == 1.0) // 1/98
    assert(!rows.contains("tiny"))
  }

  test("whale curve deciles cover all customers and cumulate to exactly 1") {
    val rows = Relational.whaleCurve(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 9))
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(rows.last.getDouble(4) == 1.0)                 // cum share closes at 1
    assert(rows.head.getDouble(3) >= rows.last.getDouble(3)) // whales first
    val cums = rows.map(_.getDouble(4)).toSeq
    assert(cums == cums.sorted)                           // monotone cumulative
  }

  test("brand gini is bounded in [0,1) and zero for a uniform brand") {
    val rows = Relational.brandGini(spark, sf).collect()
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)} gini=$g")
    }
  }

  test("neyman allocation shares sum to 1 and the budget is conserved within rounding") {
    val rows = Relational.neymanAllocation(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
    val alloc = rows.map(_.getLong(4)).sum
    assert(alloc >= 995 && alloc <= 1005) // per-stratum rounding only
  }

  test("session lift matrix is symmetric in counts and lift is positive") {
    val rows = EventAnalytics.sessionTypeLift(spark, sf).collect()
    val n = rows.map(r => (r.getString(1), r.getString(0)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(n((r.getString(0), r.getString(1))) == r.getLong(2),
        "n_ab must equal n_ba (co-occurrence is symmetric)")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("value migration matrix conserves customers in both halves") {
    val rows = Relational.valueMigration(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey")).distinct().count()
    assert(total == nCust) // full outer join covers every active customer
    // tercile labels only from the fixed vocabulary
    val labels = Set("T1", "T2", "T3", "none")
    rows.foreach { r =>
      assert(labels(r.getString(0)) && labels(r.getString(1)))
      assert(!(r.getString(0) == "none" && r.getString(1) == "none"))
    }
  }

  test("first-order repeat bands conserve customers and rates are probabilities") {
    val rows = Relational.repeatRateByFirstOrder(spark, sf).collect()
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("tfidf cosine pairs are id-ordered with cosines in (0,1]") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = Corpus.tfidfCosinePairs(docs).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0 + 1e-9)
    }
    // identical docs (if any exact dups exist) must score exactly 1
    val exact = Dedup.exact(docs).filter(col("n_copies") > 1)
    if (exact.count() > 0) assert(rows.exists(_.getDouble(2) == 1.0))
  }

  test("brand movers rank deltas are zero-sum per year transition") {
    val rows = Relational.brandRankMovers(spark, sf).collect()
    // every brand present in consecutive years: deltas per transition
    // cancel (a climb is someone else's fall) when the brand set is
    // stable — assert per-year delta sums are bounded by the max rank
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      val sum = rs.map(_.getLong(4)).sum
      assert(math.abs(sum) <= rs.length,
        "rank deltas must (near-)cancel within a year transition")
    }
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(3) >= 1))
  }

  test("entry-channel value conserves the session census with q272") {
    val byEntry = EventAnalytics.entryChannelValue(spark, sf).collect()
    val matrix = EventAnalytics.sessionEntryExit(spark, sf).collect()
    // same sessionization: per-entry session counts must agree
    val a = byEntry.map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = matrix.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    assert(a == b)
    byEntry.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("signup-to-purchase ladder covers every signup user exactly once") {
    val rows = EventAnalytics.signupToPurchase(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 2e-5)
    val signups = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == signups)
  }

  test("trade balance is globally zero-sum (every export is someone's import)") {
    val rows = Relational.tradeBalance(spark, sf).collect()
    val net = rows.map(r => math.round(r.getDouble(3) * 100)).sum
    assert(net == 0L, s"global net balance must be 0 cents, got $net")
    val exp = rows.map(r => math.round(r.getDouble(1) * 100)).sum
    val imp = rows.map(r => math.round(r.getDouble(2) * 100)).sum
    assert(exp == imp)
  }

  test("top brands + OTHER covers all revenue with shares summing to 1") {
    val rows = Relational.topBrandsWithOther(spark, sf).collect()
    assert(rows.count(_.getString(0) != "OTHER") == 5)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-5)
    val other = rows.filter(_.getString(0) == "OTHER").head
    // the named top-5 each out-earn every brand inside OTHER: the
    // smallest named share beats OTHER's mean per-brand share
    val minNamed = rows.filter(_.getString(0) != "OTHER")
      .map(_.getDouble(2)).min
    assert(minNamed >= other.getDouble(2) / other.getLong(1))
  }

  test("source purity covers every source with purity in (0,1]") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = Corpus.sourcePurity(docs).collect()
    assert(rows.length == docs.select(col("source")).distinct().count())
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("user specialization entropy is bounded by ln(n_types)") {
    val rows = EventAnalytics.userSpecialization(spark, sf).collect()
    rows.foreach { r =>
      val h = r.getDouble(2)
      assert(h >= 0.0 && h <= math.log(r.getLong(0).toDouble) + 1e-9,
        s"mean entropy $h exceeds ln(${r.getLong(0)})")
    }
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
  }

  test("stylometry profile divergence is bounded by 2 and keyed per source") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = Corpus.stylometryProfile(docs).collect()
    assert(rows.length == docs.select(col("source")).distinct().count())
    // L1 between two probability sub-vectors (each summing ≤ 1) is ≤ 2
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 2.0))
  }
}
