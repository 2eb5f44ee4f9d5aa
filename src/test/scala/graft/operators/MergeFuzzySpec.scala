package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Semantics gates for the round-2 batch: MERGE upsert, edit-distance
  * join, sketch heavy hitters, int8 quantization, incremental agg.
  */
class MergeFuzzySpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  test("mergeUpsert: change rows win wholesale, including their NULLs") {
    val target = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0)))
      .toDF("k", "s", "v")
    val changes = Seq((2L, None: Option[String], Some(9.0)),
      (3L, Some("c"), None: Option[Double])).toDF("k", "s", "v")
    val out = Merge.mergeUpsert(target, changes, Seq("k"))
      .orderBy(col("k")).collect()
    // k=1 untouched; k=2 updated (s nulled BY the change — no value-level
    // coalesce resurrection); k=3 inserted
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getString(1) == "a")
    assert(out(1).getLong(0) == 2L && out(1).isNullAt(1)
      && out(1).getDouble(2) == 9.0)
    assert(out(2).getLong(0) == 3L && out(2).getString(1) == "c"
      && out(2).isNullAt(2))
  }

  test("mergeUpsert: a NULL-key change row still wins over its match") {
    // the null-safe join matches NULL keys, so the presence flag must
    // come from a change-side marker, not from key nullability
    val target = Seq((Some(1L), Some("a")), (None: Option[Long], Some("old")))
      .toDF("k", "s")
    val changes = Seq((None: Option[Long], Some("new")),
      (Some(2L), Some("b"))).toDF("k", "s")
    val out = Merge.mergeUpsert(target, changes, Seq("k"))
      .orderBy(col("k")).collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(0) && out(0).getString(1) == "new")
    assert(out(1).getLong(0) == 1L && out(1).getString(1) == "a")
    assert(out(2).getLong(0) == 2L && out(2).getString(1) == "b")
  }

  test("mergeUpsert rejects mismatched schemas") {
    val t = Seq((1L, "a")).toDF("k", "s")
    val c = Seq((1L, "a")).toDF("k", "other")
    intercept[IllegalArgumentException] {
      Merge.mergeUpsert(t, c, Seq("k"))
    }
  }

  test("editDistanceJoin equals the naive cross filter (full recall)") {
    val left = Seq((1L, "kitten"), (2L, "ring"), (3L, "abcdefgh"))
      .toDF("lk", "ls")
    val right = Seq((10L, "sitting"), (11L, "kitten"), (12L, "rings"),
      (13L, "wrong"), (14L, "abcdefghij"), (15L, "abcdef"))
      .toDF("rk", "rs")
    val banded = Fuzzy.editDistanceJoin(left, right, "ls", "rs", 2)
      .select(col("lk"), col("rk"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val naive = left.crossJoin(right)
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .filter(col("dist") <= 2)
      .select(col("lk"), col("rk"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == naive && naive.nonEmpty)
    // the length-2 band must pair abcdefgh with abcdefghij (dist 2,
    // len +2 -> adjacent band) and must NOT lose the dist-0 duplicate
    assert(naive.contains((3L, 14L, 2)) && naive.contains((1L, 11L, 0)))
  }

  test("editDistanceJoin recall survives boundary shifts and short strings") {
    // adversarial cases for segment blocking: inserts that shift every
    // later segment boundary, edits clustered in one segment, strings
    // shorter than maxDist+1 (zero-length segments), and empty strings
    val left = Seq((1L, "abcdef"), (2L, "ab"), (3L, ""), (4L, "aXbYcdef"),
      (5L, "zzzzzzzzzz")).toDF("lk", "ls")
    val right = Seq((10L, "abcdeXf"), (11L, "Xabcdef"), (12L, "a"),
      (13L, "b"), (14L, ""), (15L, "abcdef"), (16L, "abYcdef"),
      (17L, "zzzzzzzzzzzz"), (18L, "totally-different")).toDF("rk", "rs")
    for (d <- 1 to 3) {
      val blocked = Fuzzy.editDistanceJoin(left, right, "ls", "rs", d)
        .select(col("lk"), col("rk")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = left.crossJoin(right)
        .filter(levenshtein(col("ls"), col("rs")) <= d)
        .select(col("lk"), col("rk")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked == naive, s"maxDist=$d")
      assert(naive.nonEmpty)
    }
  }

  test("editDistanceJoin candidate volume is far below the cross product") {
    // the scale contract of segment blocking: candidates ~ true matches,
    // not ~ |L|x|R| (the length-band form co-blocked most of the catalog)
    val part = new graft.cube.Engine(spark, sf).table("part")
    val probes = part.filter(pmod(col("p_partkey"), lit(23)) === 5)
      .select(col("p_partkey").as("probe_key"),
        concat(substring(col("p_name"), 1, 2),
          substring(col("p_name"), 4, 10000)).as("probe_name"))
    val catalog = part.select(col("p_partkey").as("match_key"),
      col("p_name").as("match_name"))
    val nCand = Fuzzy.candidatePairs(probes, catalog,
      "probe_name", "match_name", 2).count()
    val cross = probes.count() * catalog.count()
    val nMatch = Fuzzy.editDistanceJoin(probes, catalog,
      "probe_name", "match_name", 2).count()
    assert(nMatch >= 1)
    // 84 true matches / 208 candidates / 1800 cross at sf0.001 — the
    // bounds below leave 2x headroom on each ratio
    assert(nCand < cross / 4,
      s"candidates $nCand vs cross $cross: blocking not selective")
    assert(nCand < nMatch * 5,
      s"candidates $nCand vs matches $nMatch: verification overhead")
  }

  test("approx_top_k sketches merge across groups without rescan") {
    // capacity 16 >= 15 distinct users -> the merged estimate is exact;
    // under capacity Spark reports only GUARANTEED items (a stricter,
    // possibly empty answer — asserted below), never a wrong count
    val ev = new graft.cube.Engine(spark, sf).table("events")
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top5exact = exact.values.toSeq.sorted(Ordering[Long].reverse).take(5)
    val est = ev.groupBy(pmod(col("user_id"), lit(4)))
      .agg(expr("approx_top_k_accumulate(user_id, 16)").as("sk"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(sk, 16), 5)").as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // every reported count is the true count, and the reported counts
    // are exactly the 5 largest (item ties at the boundary may vary)
    est.foreach { case (item, c) => assert(exact(item) == c) }
    assert(est.map(_._2).toSeq.sorted(Ordering[Long].reverse) == top5exact)
    val guaranteedOnly = ev
      .agg(expr("approx_top_k(user_id, 5, 8)").as("top"))
      .select(size(col("top"))).collect()(0).getInt(0)
    assert(guaranteedOnly == 0) // eviction regime: nothing guaranteed
  }

  test("quantizeInt8: bounded reconstruction error, saturated max lane") {
    val rep = Similarity.quantizationReport(
      new graft.cube.Engine(spark, sf).table("embeddings")).collect()
    assert(rep.length == 500)
    rep.foreach { r =>
      val scale = r.getDouble(1)
      val err = r.getDouble(2)
      val sat = r.getInt(3)
      // rounding moves each lane by at most half a quantization step
      assert(err <= scale / 2 + 1e-12)
      // the max-|x| lane quantizes to exactly +/-127
      assert(sat >= 1)
    }
  }

  test("incremental merge of partials equals full recompute") {
    val inc = Relational.incrementalOrderStats(spark, sf).collect()
    val full = new graft.cube.Engine(spark, sf).table("orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spend"))
      .orderBy(col("o_custkey")).collect()
    assert(inc.length == full.length)
    inc.zip(full).foreach { case (a, b) => assert(a == b) }
  }

  test("nameSimilarityProfile: cap above every block size is exhaustive") {
    // sf0.001's largest block is 33 members — the default cap (128) and
    // an effectively-infinite cap must produce the identical profile, so
    // the oracle-scale contract (no block capped at sf0.01 either) holds
    val capped = Fuzzy.nameSimilarityProfile(spark, sf).collect()
    val full = Fuzzy.nameSimilarityProfile(spark, sf, maxBlock = 1 << 20)
      .collect()
    assert(capped.length == full.length && capped.nonEmpty)
    capped.zip(full).foreach { case (a, b) => assert(a == b) }
  }

  test("nameSimilarityProfile: a binding cap profiles the k smallest keys") {
    import org.apache.spark.sql.expressions.Window
    val k = 4
    val got = Fuzzy.nameSimilarityProfile(spark, sf, maxBlock = k)
    // scored volume bounded by C(k,2) per block; block_n stays the TRUE
    // membership so the subset-profile is visible to the reader
    val rows = got.collect()
    assert(rows.forall(_.getAs[Long]("n_pairs") <= k.toLong * (k - 1) / 2))
    assert(rows.exists(_.getAs[Long]("block_n") > k.toLong))
    // equivalence: capping ≡ exhaustive profile over the k smallest keys
    // per block (window rank is fine TEST-side; the operator avoids it)
    val p = new graft.cube.Engine(spark, sf).table("part")
      .select(col("p_partkey"), col("p_name"),
        split(col("p_name"), " ").getItem(0).as("blk"))
    val smallest = p.withColumn("__rn", row_number().over(
        Window.partitionBy(col("blk")).orderBy(col("p_partkey"))))
      .filter(col("__rn") <= k)
    val r2 = smallest.select(col("blk"), col("p_partkey").as("pk2"),
      col("p_name").as("name2"))
    val expectPairs = smallest.join(r2, "blk")
      .filter(col("p_partkey") < col("pk2"))
      .groupBy(col("blk")).agg(count(lit(1)).as("n_pairs"))
      .as[(String, Long)].collect().toMap
    rows.foreach { row =>
      assert(row.getAs[Long]("n_pairs") ==
        expectPairs(row.getAs[String]("blk")), row.getAs[String]("blk"))
    }
  }
}
