package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/minhash hot paths.
  *
  * The compositional `zip_with` + `aggregate` higher-order-function
  * forms are interpreted per *element* with boxing and per-row array
  * allocation; these expressions evaluate per *row* with primitive
  * loops — the difference between ~100s and ~1s on the sf0.1 dedup
  * benches. They are the preference-order (b) case of the build rules:
  * scalar Catalyst `Expression`s, not UDFs (no SerDe, null-safe
  * through `nullSafeEval`, usable inside joins/filters where Catalyst
  * can still push/reorder around them).
  */
object VectorExpressions {

  private def elemReader(dt: DataType): (ArrayData, Int) => Double =
    dt match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"not a float/double array: $other")
    }

  /** Per-element java accessor snippet for codegen. */
  private def genRead(dt: DataType, arr: String, i: String): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case other =>
        throw new IllegalArgumentException(s"not a float/double array: $other")
    }

  /** Loud length guard shared by eval and codegen (static call keeps
    * the generated code one line): silent prefix math over ragged
    * arrays — a truncated embedding, a corrupt PQ codebook row —
    * would return a plausible-but-wrong number; the HOF forms these
    * expressions replace surface the mismatch as NULL, and a loud
    * error beats both.
    */
  def requireSameLength(a: ArrayData, b: ArrayData, fn: String): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$fn: array length mismatch ($n vs ${b.numElements()})")
    n
  }

  /** dot(a, b): double, left-to-right accumulation (deterministic,
    * same order as the HOF form so oracle results are unchanged for
    * equal-length input; ragged input FAILS LOUDLY where the HOF
    * returns null).
    * Full `doGenCode` so the loop inlines into whole-stage codegen —
    * no boxing, no virtual calls in the 100 TB scan path.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    @transient private lazy val readL = elemReader(left.dataType)
    @transient private lazy val readR = elemReader(right.dataType)
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = requireSameLength(a, b, "dot_product")
      var s = 0.0
      var i = 0
      while (i < n) { s += readL(a, i) * readR(b, i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = graft.functions.VectorExpressions
           |  .requireSameLength($a, $b, "dot_product");
           |double ${ev.value}_acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}_acc +=
           |    (${genRead(left.dataType, a, i)}) *
           |    (${genRead(right.dataType, b, i)});
           |}
           |${ev.value} = ${ev.value}_acc;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** cosine(a, b) in a single pass (dot and both norms together),
    * codegen'd like [[DotProduct]].
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // a ZERO vector on either side has no direction: cosine is
    // undefined — NULL, never NaN (NaN silently fails every
    // >= threshold filter and poisons downstream aggregates)
    override def nullable: Boolean = true
    @transient private lazy val readL = elemReader(left.dataType)
    @transient private lazy val readR = elemReader(right.dataType)
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = requireSameLength(a, b, "cosine_sim")
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = readL(a, i); val y = readR(b, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / math.sqrt(na) / math.sqrt(nb)
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $n = graft.functions.VectorExpressions
           |  .requireSameLength($a, $b, "cosine_sim");
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = ${genRead(left.dataType, a, i)};
           |  double $y = ${genRead(right.dataType, b, i)};
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |if ($na == 0.0 || $nb == 0.0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $dot / java.lang.Math.sqrt($na)
           |    / java.lang.Math.sqrt($nb);
           |}
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** MinHash signature from a pre-hashed shingle array (array<long>):
    * k independent permutations h_i(x) = splitmix64(x + i·γ), min per
    * i, all in ONE pass over the shingles — O(|S|·k) integer mixes,
    * no per-permutation array materialization. Empty input → all
    * Long.MaxValue (deterministic).
    */
  /** Shared eval body — also the static call target of the generated
    * code (Scala object methods surface as Java statics).
    */
  def minhashEval(a: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = a.numElements()
    var j = 0
    while (j < n) {
      val base = a.getLong(j)
      var i = 0
      while (i < k) {
        var z = base + (i + 1) * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        if (z < mins(i)) mins(i) = z
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    require(k > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      minhashEval(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorExpressions.minhashEval($c, $k);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Hamming distance between two long bit-vectors of equal length
    * packed as array<long> — or use directly on two longs via
    * bit_count(xor); kept for multi-word signatures.
    */
  /** Shared eval body / static codegen target. */
  def hammingEval(a: ArrayData, b: ArrayData): Int = {
    val n = requireSameLength(a, b, "hamming")
    var d = 0; var i = 0
    while (i < n) {
      d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1
    }
    d
  }

  case class HammingDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any =
      hammingEval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorExpressions.hammingEval($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ (a_i − b_i)² over two long arrays, as an exact long — the PQ
    * codebook distance kernel ([[graft.ops.Pq]]). A HOF form
    * (`aggregate(zip_with(...))`) is semantically identical but
    * expands to a lambda tree per call; Pq builds m·k of these per
    * row, so the native loop keeps the generated code (and its
    * compile time) m·k× smaller.
    */
  case class IntDist2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"int_dist2 needs two array<bigint>, got " +
            s"${left.dataType} / ${right.dataType}")
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = requireSameLength(a, b, "int_dist2")
      var s = 0L
      var i = 0
      while (i < n) {
        val d = a.getLong(i) - b.getLong(i)
        s += d * d
        i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        s"""
           |int $n = graft.functions.VectorExpressions
           |  .requireSameLength($a, $b, "int_dist2");
           |long ${ev.value}_acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $d = $a.getLong($i) - $b.getLong($i);
           |  ${ev.value}_acc += $d * $d;
           |}
           |${ev.value} = ${ev.value}_acc;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ----- Column API -----
  def int_dist2(a: Column, b: Column): Column =
    ColumnBridge.column(IntDist2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhash_signature(shingleHashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(shingleHashes), k))

  def hamming_distance(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
