package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native per-row expressions over opaque binary media payloads — the
  * compiled stand-ins for a codec call. The RDD `mapPartitions` form
  * they replace dropped out of the columnar/codegen pipeline, paid an
  * encoder round-trip per row, and forced a manual schema re-assembly;
  * these evaluate in place inside the scan stage (CodegenFallback is a
  * compiled per-row eval — the interpretation penalty to avoid is
  * per-ELEMENT higher-order-function lambdas, not fallback eval).
  *
  * The byte arithmetic is a DETERMINISTIC FAKE of the decode boundary
  * (this environment ships no image/audio codecs): a real codec swaps
  * into the marked section of `nullSafeEval` without touching schema,
  * partitioning, or the calling plan.
  */

/** "Resize" + "frame-sample" stand-in: keep every stride-th byte down to
  * <= `target` bytes, treat the payload as `frameBytes`-sized frames and
  * keep every `sampleEvery`-th — emitting
  * struct(n_bytes, resized_bytes, n_frames, sampled_frames, checksum)
  * where checksum is the 31-multiplier rolling hash of the kept bytes.
  */
case class AssetResizeSample(child: Expression, target: Int,
    frameBytes: Int, sampleEvery: Int)
    extends UnaryExpression with CodegenFallback {

  require(target >= 1 && frameBytes >= 1 && sampleEvery >= 1)

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("resized_bytes", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sampled_frames", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"asset_resize_sample needs a binary input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val payload = input.asInstanceOf[Array[Byte]]
    // --- stub decode boundary: a codec would decode/resize here ---
    val stride = math.max(1, payload.length / target)
    var sum = 0L
    var kept = 0
    var i = 0
    while (i < payload.length) {
      sum = sum * 31 + (payload(i) & 0xff)
      kept += 1
      i += stride
    }
    val nFrames = (payload.length + frameBytes - 1) / frameBytes
    val sampled = (nFrames + sampleEvery - 1) / sampleEvery
    // --- end stub boundary ---
    new GenericInternalRow(Array[Any](payload.length, kept, nFrames, sampled, sum))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** "Decode"-and-featurize stand-in: a 16-bin byte-value histogram's L2
  * norm and argmax bin (first bin wins ties), emitted as
  * struct(n_bytes, feat_norm, top_bin).
  */
case class AssetHistogramFeature(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feat_norm", DoubleType, nullable = false),
    StructField("top_bin", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"asset_histogram_feature needs a binary input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val payload = input.asInstanceOf[Array[Byte]]
    // --- stub decode boundary: a codec would decode here ---
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1; i += 1 }
    var norm = 0.0
    var top = 0
    var j = 0
    while (j < 16) {
      norm += hist(j) * hist(j)
      if (hist(j) > hist(top)) top = j
      j += 1
    }
    // --- end stub boundary ---
    new GenericInternalRow(Array[Any](payload.length, math.sqrt(norm), top))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultimodalExpressions {
  def assetResizeSample(payload: Column, target: Int, frameBytes: Int,
      sampleEvery: Int): Column =
    Bridge.column(AssetResizeSample(Bridge.expression(payload),
      target, frameBytes, sampleEvery))

  def assetHistogramFeature(payload: Column): Column =
    Bridge.column(AssetHistogramFeature(Bridge.expression(payload)))
}
