package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling — one compiled pass per document.
  *
  * The HOF composition (transform over sequence + slice + concat_ws +
  * array_distinct) evaluates interpreted per gram and allocates a slice
  * array per position: measured ~3s for 5,000 docs, and it sits under
  * every dedup operator (computed for signatures AND for both sides of
  * the verification join). This expression builds the distinct shingle
  * set in a single tokenize pass.
  *
  * Semantics are identical to [[TextAnalysis.shinglesHof]] (first-
  * occurrence order, whole-trimmed-text fallback for docs shorter than
  * n tokens) — asserted bit-for-bit in DedupTextSpec.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val out = new java.util.LinkedHashSet[String]
    if (toks.length < n) {
      out.add(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature over a string-array column: for permutation
  * k, the min over elements of a k-seeded xxhash64. Per-row and
  * shuffle-free — the explode + 64-partial-min form it replaces is the
  * right shape for an aggregate, but a signature is per-document, so the
  * scale-optimal plan is a pure map.
  *
  * Hash chain replicates Spark's `xxhash64(lit(k), s)` exactly — note
  * `lit(k: Int)` is IntegerType, so the seed is hashInt(k, 42), NOT
  * hashLong — making signatures bit-stable against the builtin
  * composition (asserted in DedupTextSpec).
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got ${t.sql}")
    }

  @transient private lazy val seeds: Array[Long] = {
    val s = new Array[Long](numPerms)
    var k = 0
    while (k < numPerms) {
      s(k) = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, 42L)
      k += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var k = 0
      while (k < numPerms) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, seeds(k))
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-token ±1 vote source shared by [[SimHashSigns]] and [[SimHashFp]]:
  * vote k is bit k of the token's md5 digest, read as two BIG-ENDIAN
  * 64-bit words (digest bytes 0-7 and 8-15 — i.e. hex chars 1-16 and
  * 17-32). md5 is defined byte-for-byte in every engine (the
  * [[TextAnalysis.portableHash60]] discipline), so any ANSI engine
  * recomputes identical sign vectors and fingerprints; DuckDB:
  * `(CAST('0x' || substr(md5(t), 1, 16) AS UBIGINT) >> k) & 1`.
  * This is what puts q27's whole candidate-generation + verification
  * path on the cross-engine oracle surface — an engine-private seeding
  * (xxhash64) would leave the fingerprints uncheckable.
  */
private[functions] object SimHashVotes {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** (word0, word1): big-endian longs over digest bytes 0-7 / 8-15. */
  def words(s: UTF8String): (Long, Long) = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var w0 = 0L
    var w1 = 0L
    var i = 0
    while (i < 8) {
      w0 = (w0 << 8) | (dig(i) & 0xFFL)
      w1 = (w1 << 8) | (dig(i + 8) & 0xFFL)
      i += 1
    }
    (w0, w1)
  }

  /** +1 if digest bit k is set, else -1 (k < 128). */
  @inline def vote(w0: Long, w1: Long, k: Int): Int =
    if ((((if (k < 64) w0 >>> k else w1 >>> (k - 64))) & 1L) == 1L) 1 else -1
}

/** Native SimHash sign vector over a string-array column: bit i is the
  * sign of the sum over elements of +-1 by bit i of the element's md5
  * ([[SimHashVotes]] — engine-portable). Per-row, shuffle-free.
  */
case class SimHashSigns(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 128, "simhash_signs supports 1..128 bits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_signs needs array<string>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val sums = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val (w0, w1) = SimHashVotes.words(arr.getUTF8String(i))
      var k = 0
      while (k < bits) {
        sums(k) += SimHashVotes.vote(w0, w1, k)
        k += 1
      }
      i += 1
    }
    val signs = new Array[Any](bits)
    var k = 0
    while (k < bits) {
      signs(k) = java.lang.Integer.valueOf(if (sums(k) > 0) 1 else -1)
      k += 1
    }
    new GenericArrayData(signs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[SimHashSigns]] packed to its canonical 64-bit fingerprint in one
  * pass (bit i set iff the md5-bit-i vote sum ([[SimHashVotes]]) is
  * positive — exactly `Dedup.packSigns(simhash_signs(x, 64))`,
  * equivalence-tested). Emitting
  * the long directly keeps the whole dedup pipeline on 8-byte
  * fingerprints: hamming distance becomes codegen'd `bit_count(a ^ b)`
  * and banding becomes bit slicing, with no 64-element array per row.
  */
case class SimHashFp(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_fp needs array<string>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val (w0, w1) = SimHashVotes.words(arr.getUTF8String(i))
      var k = 0
      while (k < 64) {
        sums(k) += SimHashVotes.vote(w0, w1, k)
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) > 0) fp |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Jaro-Winkler string similarity — the fuzzy-matching scorer
  * record-linkage joins block on. Semantics pin the classic Winkler
  * variant exactly as DuckDB's `jaro_winkler_similarity` computes it
  * (verified against probe values, asserted in TextExprSpec): match
  * window `max(|a|,|b|)/2 - 1` floored at 0, transpositions counted as
  * `mismatched_matches / 2` in INTEGER division (a 3-cycle counts 1,
  * not 1.5), prefix bonus `min(4, common_prefix) * 0.1 * (1 - jaro)`
  * applied only when jaro exceeds 0.7. All arithmetic is small-integer
  * ratios — no libm — so both engines produce bit-identical doubles.
  *
  * Per-row and shuffle-free; the blocked self-join around it supplies
  * the candidate pairs.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two string inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def similarity(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val t = trans / 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

object TextExpressions {
  /** Column entry point: distinct word n-gram shingles, native. */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** Jaro-Winkler similarity of two string columns (DuckDB-equivalent
    * semantics, bit-stable across engines).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** MinHash signature of a string-array column (numPerms longs). */
  def minhashSig(elems: Column, numPerms: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(elems), numPerms))

  /** SimHash +-1 sign vector of a string-array column. */
  def simhashSigns(elems: Column, bits: Int = 64): Column =
    Bridge.column(SimHashSigns(Bridge.expression(elems), bits))

  /** Packed 64-bit SimHash fingerprint of a string-array column. */
  def simhashFp(elems: Column): Column =
    Bridge.column(SimHashFp(Bridge.expression(elems)))

  /** SQL builder per function name. The arity parameter must be a
    * literal (it shapes the expression at plan time). Shared between
    * session-local registration ([[register]]) and config-time injection
    * ([[graft.GraftExtensions]]).
    */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def litInt(name: String, e: Expression): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name: second argument must be an integer literal, got $other")
    }
    Seq(
      "word_shingles" -> { es =>
        require(es.length == 2, s"word_shingles takes 2 arguments, got ${es.length}")
        WordShingles(es(0), litInt("word_shingles", es(1)))
      },
      "minhash_sig" -> { es =>
        require(es.length == 2, s"minhash_sig takes 2 arguments, got ${es.length}")
        MinHashSig(es(0), litInt("minhash_sig", es(1)))
      },
      "simhash_signs" -> { es =>
        require(es.length == 2, s"simhash_signs takes 2 arguments, got ${es.length}")
        SimHashSigns(es(0), litInt("simhash_signs", es(1)))
      },
      "jaro_winkler" -> { es =>
        require(es.length == 2, s"jaro_winkler takes 2 arguments, got ${es.length}")
        JaroWinkler(es(0), es(1))
      })
  }

  /** Register the native text expressions for SQL callers:
    * `word_shingles(text, n)`, `minhash_sig(arr, numPerms)`,
    * `simhash_signs(arr, bits)`, `jaro_winkler(a, b)`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
