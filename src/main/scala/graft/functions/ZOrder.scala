package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) clustering — the multi-column analogue of Delta's
  * `OPTIMIZE ZORDER BY` / liquid clustering. Sorting by the
  * interleaved key co-locates rows that are close in ANY clustered
  * dimension, so Parquet row-group min/max stats prune on every
  * clustered column, not just the first of a lexicographic sort.
  *
  * Like Delta, values are first mapped to *range bucket ids* from
  * sampled quantiles (`approxQuantile` — distributed sampling, no
  * global sort), because interleaving raw bit patterns would put all
  * the information of small integers into bits the interleave never
  * sees. Pipeline: order-preserving double → quantile bucket id →
  * bit-interleave of bucket ids.
  */
object ZOrder {

  /** Static codegen target: first 8 bytes of the string, big-endian,
    * as an unsigned magnitude (order-preserving up to that prefix).
    */
  def stringOrderedDouble(s: UTF8String): Double = {
    // zero-copy prefix read: only the first 8 bytes matter, and
    // s.getBytes would copy the WHOLE string per row — a multi-KB
    // document column z-ordered at corpus scale pays that allocation
    // millions of times (same Platform idiom as the bloom shingle
    // walker in this package)
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var acc = 0.0
    var i = 0
    while (i < 8) {
      acc = acc * 256.0 +
        (if (i < n) org.apache.spark.unsafe.Platform.getByte(
          base, off + i) & 0xFF
         else 0)
      i += 1
    }
    acc
  }

  /** Static codegen target: bucket id via binary search over sorted
    * split points (id in [0, splits.length]).
    */
  def bucketOf(x: Double, splits: Array[Double]): Int = {
    var lo = 0
    var hi = splits.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (x <= splits(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Static codegen target: interleave the low `bitsPer` bits of each
    * id, round-robin from the most significant bit.
    */
  def interleave(ids: Array[Long], bitsPer: Int): Long = {
    var z = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var c = 0
      while (c < ids.length) {
        z = (z << 1) | ((ids(c) >>> b) & 1L)
        c += 1
      }
      b -= 1
    }
    z
  }

  /** Order-preserving conversion of any supported column type to
    * double (for quantile bucketing; exactness is not required, only
    * monotonicity up to bucket resolution). Codegen'd: numeric types
    * inline as a plain cast, strings as one static call.
    */
  case class OrderPreservingDouble(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = child.dataType match {
      case LongType => v.asInstanceOf[Long].toDouble
      case IntegerType => v.asInstanceOf[Int].toDouble
      case ShortType => v.asInstanceOf[Short].toDouble
      case ByteType => v.asInstanceOf[Byte].toDouble
      case DateType => v.asInstanceOf[Int].toDouble
      case TimestampType | TimestampNTZType => v.asInstanceOf[Long].toDouble
      case DoubleType => v.asInstanceOf[Double]
      case FloatType => v.asInstanceOf[Float].toDouble
      case BooleanType => if (v.asInstanceOf[Boolean]) 1.0 else 0.0
      case StringType =>
        stringOrderedDouble(v.asInstanceOf[UTF8String])
      case other =>
        throw new IllegalArgumentException(s"zorder: unsupported $other")
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => child.dataType match {
        case BooleanType => s"${ev.value} = $c ? 1.0 : 0.0;"
        case StringType =>
          s"${ev.value} = graft.functions.ZOrder.stringOrderedDouble($c);"
        case DoubleType => s"${ev.value} = $c;"
        case _ => s"${ev.value} = (double) $c;"
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Bucket id from sorted split points (binary search; id in
    * [0, splits.length]). Nulls → bucket 0 (nulls-first). The split
    * array rides into generated code as a referenced object.
    */
  case class RangeBucket(child: Expression, splits: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return 0
      bucketOf(v.asInstanceOf[Double], splits)
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val splitsRef = ctx.addReferenceObj("splits", splits, "double[]")
      val childGen = child.genCode(ctx)
      ev.copy(code =
        code"""
           |${childGen.code}
           |int ${ev.value} = ${childGen.isNull} ? 0 :
           |  graft.functions.ZOrder.bucketOf(${childGen.value}, $splitsRef);
           |""".stripMargin, isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Interleave the low `bitsPer` bits of each bucket id, round-robin
    * from the most significant bit.
    */
  case class InterleaveBits(children: Seq[Expression], bitsPer: Int)
      extends Expression {
    require(children.nonEmpty && children.size * bitsPer <= 63)
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val n = children.size
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) {
        val v = children(i).eval(input)
        ids(i) = if (v == null) 0L else v.asInstanceOf[Int].toLong
        i += 1
      }
      interleave(ids, bitsPer)
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val gens = children.map(_.genCode(ctx))
      val arr = ctx.freshName("ids")
      val evalAll = gens.map(_.code).reduce(_ + _)
      val fills = gens.zipWithIndex.map { case (g, i) =>
        s"$arr[$i] = ${g.isNull} ? 0L : (long) (${g.value});"
      }.mkString("\n")
      ev.copy(code = evalAll +
        code"""
           |long[] $arr = new long[${children.size}];
           |$fills
           |long ${ev.value} =
           |  graft.functions.ZOrder.interleave($arr, $bitsPer);
           |""".stripMargin, isNull = FalseLiteral)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  val BucketBits = 8 // 256 range buckets per dimension, like Delta's default scale

  /** Append a `_zorder` column: quantile-bucket each cluster column
    * (sampled, distributed — no global sort), interleave the bucket
    * ids. `relativeError` trades sample cost for bucket evenness.
    */
  def withZOrderKey(df: DataFrame, cols: Seq[String],
                    relativeError: Double = 0.01): DataFrame = {
    val nBuckets = 1 << BucketBits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val ordCols = cols.zipWithIndex.map { case (c, i) =>
      ColumnBridge.column(OrderPreservingDouble(
        ColumnBridge.expression(col(c)))).as(s"_zn$i")
    }
    val withOrd = df.select((df.columns.map(col) ++ ordCols): _*)
    // one pass over the data for ALL dimensions' split points (the
    // multi-column overload), not one scan per clustered column
    val allSplits = withOrd.stat.approxQuantile(
      cols.indices.map(i => s"_zn$i").toArray, probs, relativeError)
    val bucketExprs = cols.indices.map { i =>
      RangeBucket(ColumnBridge.expression(col(s"_zn$i")),
        allSplits(i).distinct.sorted)
    }
    withOrd
      .withColumn("_zorder", ColumnBridge.column(
        InterleaveBits(bucketExprs, BucketBits)))
      .drop(cols.indices.map(i => s"_zn$i"): _*)
  }

  /** One-shot key for already-bucketed/test use. */
  def zorder_key(df: DataFrame, cols: Seq[String]): DataFrame =
    withZOrderKey(df, cols)
}
