package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics for the q307–q312 batch: the bloom contract's
  * structural halves, MASE mass conservation, decontamination census
  * conservation, coherence pair counts, the NDCG identity at
  * full-dimension truncation, and the PVM bridge's exact
  * reconciliation — cases the fixture-scale oracle equality can't
  * isolate.
  */
class StatBatch4Spec extends SparkFunSuite {

  private def emb = new graft.cube.Engine(spark, sf).table("embeddings")

  test("bloom contract holds and partitions the customer set") {
    val r = Relational.bloomMembershipContract(spark, sf).collect().head
    assert(r.getBoolean(3))
    assert(r.getLong(1) + r.getLong(2) == r.getLong(0))
  }

  test("seasonal MASE aggregates exact cents and covers every joined day") {
    val out = Relational.seasonalMase(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 7)
    out.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 7)
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
      // mase is null only when the naive error is exactly 0
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0)
      else assert(r.getLong(3) == 0L)
    }
  }

  test("semantic decontamination census conserves the non-eval corpus") {
    val out = Similarity.semanticDecontam(emb).collect()
    val nonEval = emb.filter(col("label") =!= 0).count()
    assert(out.map(_.getLong(1)).sum == nonEval)
    out.foreach { r =>
      val bin = r.getLong(0)
      assert(bin >= 0 && bin <= 40)
      // the bin's max sits inside the bin's [lo, hi) cosine range
      val c = r.getDouble(2)
      assert(c >= bin * 0.05 - 1.0 - 1e-9 && c < (bin + 1) * 0.05 - 1.0)
    }
  }

  test("source coherence emits C(5,2) pairs per source with defined means") {
    val out = Corpus.sourceCoherence(
      new graft.cube.Engine(spark, sf).table("documents")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == 10L)
      // a defined mean requires at least one co-occurring pair
      if (r.getLong(2) < 10) assert(!r.isNullAt(3))
    }
  }

  test("truncation NDCG is exactly 1 at full dimension and conserves anchors") {
    val full = Similarity.truncationNdcg(emb, truncDim = 64).collect()
    assert(full.length == 1 && full.head.getLong(0) == 10L &&
      full.head.getDouble(2) == 1.0)
    val trunc = Similarity.truncationNdcg(emb, truncDim = 16).collect()
    val anchors = emb.filter(col("vec_id") < 128).count()
    assert(trunc.map(_.getLong(1)).sum == anchors)
    trunc.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1.0)
    }
  }

  test("price-volume bridge reconciles effects to the exact delta") {
    val out = Relational.priceVolumeMix(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (delta, pe, ve) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // each effect is 2dp-rounded, so the identity holds to 1 cent each
      assert(math.abs(pe + ve - delta) <= 0.021)
    }
  }
}
