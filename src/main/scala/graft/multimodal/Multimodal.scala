package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as batch-shaped partition functions.
  *
  * The decode step itself is a DETERMINISTIC FAKE (this environment has no
  * image/audio codecs): payload bytes are synthesized from the document
  * text, and "features" are a byte-value histogram. Everything around it —
  * schema, metadata struct, batch iteration shape, partitioning — is real:
  * swapping the fake for a JNI/codec call changes one function body.
  *
  * Scale notes: payloads never shuffle (all ops are per-row / per
  * partition); feature extraction is mapPartitions (the Scala analog of
  * mapInPandas batch shape) so a codec can amortize init per partition.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to the documents table.
    * Metadata (format/width/height) is deterministically derived — the
    * stand-in for real per-asset metadata.
    */
  def withAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("source"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(16) + col("doc_id") % 64).cast("int").as("width"),
        (lit(16) + col("doc_id") % 48).cast("int").as("height"),
        length(col("text").cast("binary")).as("n_bytes")).as("meta"))

  /** Per-source asset rollup over the metadata struct (oracle-checkable —
    * exercises the schema path end-to-end without decoding).
    */
  def assetStats(docs: DataFrame): DataFrame =
    withAssets(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("meta.n_bytes")).cast("long").as("total_bytes"),
        round(avg(col("meta.width")), 4).as("avg_width"),
        max(col("meta.format")).as("max_format"))
      .orderBy(col("source"))

  private val transformSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("resized_bytes", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sampled_frames", IntegerType),
    StructField("checksum", LongType)))

  /** "Resize" + "frame-sample" stand-ins, batch-per-partition over the
    * binary payload (the shapes a codec-backed pipeline needs):
    *   - resize: keep every stride-th byte down to <= `target` bytes;
    *   - frame-sample: treat the payload as fixed-size frames and keep
    *     every `sampleEvery`-th frame.
    * Deterministic byte arithmetic; a real image/video codec swaps in at
    * the marked lines without touching schema or partitioning.
    */
  def resizeAndSample(
      docs: DataFrame,
      target: Int = 64,
      frameBytes: Int = 32,
      sampleEvery: Int = 4): DataFrame = {
    val assets = withAssets(docs)
      .select(col("doc_id"), col("meta.format").as("format"), col("payload"))
    val spark = assets.sparkSession
    val rows = assets.rdd.mapPartitions { it =>
      it.map { r =>
        val docId = r.getLong(0)
        val format = r.getString(1)
        val payload = r.getAs[Array[Byte]](2)
        // --- stub decode boundary: a codec would decode here ---
        val stride = math.max(1, payload.length / target)
        val resized = payload.indices.by(stride).map(payload).toArray
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        val sampled = (0 until nFrames by sampleEvery).size
        var sum = 0L
        var i = 0
        while (i < resized.length) { sum = sum * 31 + (resized(i) & 0xff); i += 1 }
        // --- end stub boundary ---
        Row(docId, format, payload.length, resized.length, nFrames, sampled, sum)
      }
    }
    spark.createDataFrame(rows, transformSchema).orderBy(col("doc_id"))
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("feat_norm", DoubleType),
    StructField("top_bin", IntegerType)))

  /** "Decode" each asset and extract a 16-bin byte-value histogram
    * feature, batch-per-partition. The histogram stands in for pixel/
    * sample statistics; its L2 norm and argmax bin are emitted as compact
    * features. Deterministic: depends only on payload bytes.
    */
  def decodeFeatures(docs: DataFrame): DataFrame = {
    val assets = withAssets(docs)
      .select(col("doc_id"), col("meta.format").as("format"), col("payload"))
    val spark = assets.sparkSession
    val rows = assets.rdd.mapPartitions { it =>
      // per-partition init happens here (codec handles, buffers, ...)
      it.map { r =>
        val docId = r.getLong(0)
        val format = r.getString(1)
        val payload = r.getAs[Array[Byte]](2)
        val hist = new Array[Double](16)
        var i = 0
        while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1; i += 1 }
        var norm = 0.0; var top = 0; var j = 0
        while (j < 16) {
          norm += hist(j) * hist(j)
          if (hist(j) > hist(top)) top = j
          j += 1
        }
        Row(docId, format, payload.length, math.sqrt(norm), top)
      }
    }
    spark.createDataFrame(rows, featureSchema).orderBy(col("doc_id"))
  }
}
