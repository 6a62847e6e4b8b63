package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bottom-k (KMV) set sketch as a `TypedImperativeAggregate`: the k
  * smallest distinct xxhash64 values of the aggregated column. A
  * mergeable, fixed-size summary of a set — the classic sketch for
  * distinct-count and Jaccard estimation over huge groups:
  *
  *  - map-side partial aggregation keeps at most k longs per group
  *    per partition (vs. collecting the group's whole value set);
  *  - merges are associative/commutative (union, keep k smallest);
  *  - deterministic (hash-ordered, no RNG), so results are replayable
  *    and oracle-stable.
  *
  * Jaccard between two sketches: of the k smallest of the union,
  * count the fraction present in both — see [[BottomKSketch.jaccard]]
  * (pure array built-ins, no UDF).
  */
case class BottomKSketch(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k > 0)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      buf.add(h)
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // ascending (TreeSet order)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BottomKSketch {

  /** Aggregate Column: bottom-k sketch of `col` values. */
  def bottom_k_sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSketch(ColumnBridge.expression(c), k)
        .toAggregateExpression())

  /** Jaccard estimate from two bottom-k sketches (array<long>,
    * ascending): fraction of the union's k smallest present in both.
    * Pure array built-ins — codegen-friendly, no UDF.
    */
  def jaccard(a: Column, b: Column, k: Int): Column = {
    val unionBottomK = slice(array_sort(array_union(a, b)), 1, k)
    val inBoth = array_intersect(unionBottomK, array_intersect(a, b))
    size(inBoth).cast("double") /
      least(size(unionBottomK), lit(k)).cast("double")
  }
}
