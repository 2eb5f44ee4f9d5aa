package graft.operators

import graft.SparkFunSuite
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class IvfSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  /** Synthetic well-separated clusters: 4 clusters x 25 vectors around
    * orthogonal-ish axes, so coarse quantization is meaningful (the
    * fixture embeddings are near-random).
    */
  private def clustered = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until 25
    } yield {
      val base = Array.fill(16)(0.05f)
      base(c * 4) = 1.0f
      // deterministic small perturbation
      base(c * 4 + 1) = 0.1f + (i % 5) * 0.01f
      ((c * 25 + i).toLong, base.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("kmeans finds the planted clusters") {
    val cents = Similarity.kmeans(clustered, k = 4, iters = 5).collect()
    assert(cents.length == 4)
    // each centroid should be dominated by one planted axis
    val axes = cents.map { r =>
      val c = r.getSeq[Double](1)
      c.indices.maxBy(c(_)) / 4
    }
    assert(axes.toSet == Set(0, 1, 2, 3))
  }

  test("ivf top-k on clustered data matches brute force") {
    val bf = Similarity.bruteForceTopK(clustered, 0L, 5)
      .collect().map(_.getLong(0)).toSeq
    val ivf = Similarity.ivfTopK(clustered, 0L, 5, nlist = 4, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    // query 0 lives in cluster 0; its true neighbors are in the same cell,
    // so probing a single cell recovers the exact top-k
    assert(ivf == bf)
  }

  test("ivf with all cells probed equals brute force on the fixture") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSeq
    val ivf = Similarity.ivfTopK(emb, 0L, 10, nlist = 8, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == bf) // nprobe = nlist => exhaustive => exact
  }

  test("decodeFeatures computes the byte-histogram features exactly") {
    val docs = Seq((3L, "aaaa", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Multimodal.decodeFeatures(docs).collect().head
    assert(r.getInt(2) == 4)      // n_bytes
    assert(r.getDouble(3) == 4.0) // all bytes 0x61 -> one bin of count 4
    assert(r.getInt(4) == 6)      // 0x61 / 16 = bin 6
  }

  test("resize and frame-sample are deterministic and bounded") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val a = Multimodal.resizeAndSample(docs).collect()
    val b = Multimodal.resizeAndSample(docs).collect()
    assert(a.toSeq == b.toSeq)
    a.foreach { r =>
      val (n, resized, frames, sampled) =
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(resized <= math.max(64, n / (n / 64).max(1) + 1))
      assert(sampled == (frames + 3) / 4)
    }
  }
}
