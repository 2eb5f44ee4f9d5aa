package graft.functions

import graft.SparkFunSuite
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorSpec extends SparkFunSuite {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("native cosine expression equals the HOF composition on real data") {
    val pairs = emb.limit(50).select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("b_id"), col("embedding").as("b")))
    val diff = pairs.select(
      abs(Similarity.cosineHof(col("a"), col("b")) -
        VectorExpressions.cosineNative(col("a"), col("b"))).as("d"))
      .agg(max(col("d"))).collect().head.getDouble(0)
    assert(diff == 0.0) // bit-identical, not just close
  }

  test("native cosine is SQL-callable after registration") {
    VectorExpressions.register(spark)
    emb.limit(5).createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS c FROM emb_v")
      .collect().map(_.getDouble(0))
    assert(r.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("native cosine type-checks its inputs") {
    val e = intercept[Exception] {
      emb.select(VectorExpressions.cosineNative(col("vec_id"), col("embedding")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("VectorAvg aggregator centroids equal the posexplode implementation") {
    val a = Similarity.labelCentroids(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val b = Similarity.labelCentroidsAgg(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("VectorAvg rejects dimension mismatch instead of truncating") {
    import graft.SparkTestBase.spark.implicits._
    val df = Seq((1, Seq(1.0f, 2.0f)), (1, Seq(3.0f))).toDF("g", "v")
    val e = intercept[Throwable] {
      df.groupBy(col("g")).agg(VectorAvg.column(col("v")).as("c")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dimension mismatch")))
  }

  test("brute-force top-k identical under HOF and native cosine") {
    val hof = Similarity.bruteForceTopK(emb, 0L, 10,
      Similarity.cosineHof).collect().toSeq
    val nat = Similarity.bruteForceTopK(emb, 0L, 10).collect().toSeq
    assert(hof == nat)
  }

  test("native expressions accept float AND double embedding encodings identically") {
    // the round-9 lesson (events ts changed physical type between fixture
    // generations) applied to embeddings: if a future drop ships
    // list<double> instead of list<float>, the expressions must keep
    // working and agree after widening — pin BOTH element types through
    // the same pipeline now
    val asFloat = emb.limit(50)
      .select(col("vec_id"), col("embedding"))
    val asDouble = asFloat
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(df.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(VectorExpressions.cosineNative(col("a"), col("b")), 6).as("c"),
        round(VectorExpressions.dotNative(col("a"), col("b")), 4).as("d"))
    val f = pairsOf(asFloat).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3))).toSeq
    val d = pairsOf(asDouble).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3))).toSeq
    assert(f == d, "float- and double-encoded embeddings diverged")
    // the typed aggregator rides the same contract: identical centroids
    // from either encoding (column() widens explicitly — never narrows)
    val cf = emb.limit(50).select((col("vec_id") % 3).as("g"), col("embedding"))
      .groupBy(col("g")).agg(VectorAvg.column(col("embedding")).as("c"))
      .orderBy(col("g")).collect().map(_.getSeq[Double](1)).toSeq
    val cd = emb.limit(50).select((col("vec_id") % 3).as("g"),
        col("embedding").cast("array<double>").as("embedding"))
      .groupBy(col("g")).agg(VectorAvg.column(col("embedding")).as("c"))
      .orderBy(col("g")).collect().map(_.getSeq[Double](1)).toSeq
    assert(cf == cd, "VectorAvg centroids diverged across encodings")
  }
}
