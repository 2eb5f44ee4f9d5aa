package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for fused cosine similarity over
  * `array<float>` / `array<double>` columns.
  *
  * The composed higher-order-function form (zip_with + two aggregates per
  * norm) walks the arrays five times and allocates an intermediate array;
  * this expression is one fused loop with no allocation, participating in
  * whole-stage codegen via `doGenCode`. Preference order per the build
  * charter: built-ins first (the HOF form in [[graft.operators.Similarity]]
  * remains the reference implementation), native Expression where the hot
  * path justifies it — brute-force kNN scans every vector, so it does.
  *
  * Semantics match [[graft.operators.Similarity.cosine]] bit-for-bit:
  * element-wise double accumulation in index order, 0.0 when either norm
  * is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = (t: DataType, v: String, i: String) => t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, na, nb, n, i, d) = ("dot_" + ev.value, "na_" + ev.value,
        "nb_" + ev.value, "n_" + ev.value, "i_" + ev.value, "d_" + ev.value)
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = ${getter(ta, a, i)};
         |  double y = ${getter(tb, b, i)};
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native fused dot product — same loop as [[CosineSimilarity]] without
  * the norms; used for the LSH hyperplane projections (24+ dot products
  * per row turn the HOF form into the scan bottleneck).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      val x = if (ta == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (tb == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = (t: DataType, v: String, i: String) => t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, n, i) = ("dot_" + ev.value, "n_" + ev.value, "i_" + ev.value)
      s"""
         |double $dot = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(ta, a, i)} * ${getter(tb, b, i)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API entry point for the native fused dot product. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column-API entry point for the native fused cosine. */
  def cosineNative(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** SQL builder per function name; shared between session-local
    * registration ([[register]]) and config-time injection
    * ([[graft.GraftExtensions]]).
    */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def binary(name: String, f: (Expression, Expression) => Expression)
        (es: Seq[Expression]): Expression = {
      require(es.length == 2, s"$name takes exactly 2 arguments, got ${es.length}")
      f(es(0), es(1))
    }
    Seq(
      "cosine_similarity" -> binary("cosine_similarity", CosineSimilarity.apply) _,
      "dot_product" -> binary("dot_product", DotProduct.apply) _)
  }

  /** Register `cosine_similarity(a, b)` and `dot_product(a, b)` for SQL
    * callers.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
