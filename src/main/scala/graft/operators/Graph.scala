package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. Connected components
  * (pointer jumping) lives in [[Dedup.clusters]]; this adds PageRank —
  * the standard importance measure over the near-duplicate similarity
  * graph (a high-rank doc is the "canonical" member of a dense
  * near-dup neighborhood, a useful curation signal).
  *
  * Scale shape: each iteration is one shuffle — contributions =
  * ranks ⋈ edges grouped by destination; the edge list is partitioned
  * by src and reused every iteration (cached), ranks are the only
  * moving table. Lineage is truncated with localCheckpoint every few
  * iterations, the same barrier discipline as [[Dedup.clusters]] —
  * without it the plan doubles per iteration and the driver, not the
  * data, becomes the bottleneck.
  */
object Graph {

  /** PageRank with uniform teleport over the nodes present in `edges`
    * (directed; pass both directions for an undirected graph). Fixed
    * iteration count keeps the result deterministic and cross-engine
    * checkable.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .repartition(col("src"))
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().cache()
    val n = nodes.count()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contrib = ranks
        .join(outDeg, col("node") === col("src"))
        .join(e, "src")
        .select(col("dst").as("node"), (col("rank") / col("out_deg")).as("c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .groupBy(col("node"))
        .agg((lit((1.0 - damping) / n) +
          lit(damping) * coalesce(sum(col("c")), lit(0.0))).as("rank"))
      if (i % 2 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Fixture wiring (q90): rank the near-dup graph of the documents
    * table. Edges are the verified minhash pairs (identical pair set to
    * the exact-Jaccard oracle — q26's parity), symmetrized. The pair
    * frame is the session-shared one ([[Dedup.minhashPairsShared]]) —
    * q26/q41/q42/q56/q80 consume the same frame, so the LSH pipeline
    * runs once per dataset, not once per query.
    */
  def docPageRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = new graft.cube.Engine(spark, dir).table("documents")
    val pairs = Dedup.minhashPairsShared(docs, dir).select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    pageRank(edges)
      .select(col("node").as("doc_id"), round(col("rank"), 6).as("rank"))
      .orderBy(col("doc_id"))
  }
}
