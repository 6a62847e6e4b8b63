package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The driver builds a [[BloomFilter]] once (a distributed
  * treeAggregate via `df.stat.bloomFilter`); the expression carries it
  * into the plan as a referenced object, so every executor probes a
  * local in-memory filter — a fixed-size membership gate over
  * arbitrarily many probe rows. This is the scale path for benchmark
  * decontamination: a benchmark shingle SET too big to broadcast as a
  * hash relation still fits as a few-MB bit array at 1% fpp
  * (~9.6 bits/item), and the scan-side test is two hash mixes per row
  * inside whole-stage codegen.
  */
object BloomExpressions {

  case class BloomMightContainLong(child: Expression, bf: BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any =
      bf.mightContainLong(v.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bf,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.mightContainLong($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `true` when the (long-typed) column might be in the filter —
    * never a false negative; false positives at the filter's fpp.
    */
  def might_contain_long(bf: BloomFilter, x: Column): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(x), bf))

  /** Per-GROUP Bloom filter as a `TypedImperativeAggregate`: the
    * serialized [[BloomFilter]] of the group's non-null (long-typed,
    * pre-hashed) inputs. The file-level membership index builder —
    * one aggregation pass over newly written files yields one
    * fixed-size bit array per (file, column):
    *
    *  - map-side partials are BloomFilters too (bounded memory per
    *    group per partition, never a value set);
    *  - merge is bitwise OR ([[BloomFilter.mergeInPlace]]) —
    *    associative/commutative;
    *  - output bytes are Spark's stable sketch wire format
    *    ([[BloomFilter.readFrom]] on the probe side), deterministic
    *    for a given input SET (hash positions don't care about
    *    insertion order), so sidecar bytes are replayable.
    *
    * `expectedItems`/`fpp` size the filter once at buffer creation
    * (all groups in one build share the sizing; ~9.6 bits/item at 1%).
    */
  case class BloomBitsAgg(
      child: Expression, expectedItems: Long, fpp: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomFilter] {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): BloomFilter =
      BloomFilter.create(expectedItems, fpp)

    override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
      val v = child.eval(input)
      if (v != null) buf.putLong(v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
      buf.mergeInPlace(other)
      buf
    }

    override def eval(buf: BloomFilter): Any = serialize(buf)

    override def serialize(buf: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      buf.writeTo(out)
      out.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

    override def withNewMutableAggBufferOffset(o: Int): BloomBitsAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomBitsAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** Probe side of the file-level index: does the serialized filter
    * in this BINARY column possibly contain ANY of the (pre-computed)
    * hashes? One deserialization per row — the probe scan has one row
    * per (file, column), so total probe cost is O(index bytes), and
    * a row's test is k bit-lookups per hash inside codegen.
    */
  case class BloomBytesMightContainAny(child: Expression,
                                       hashes: Array[Long])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any =
      BloomExpressions.anyContained(v.asInstanceOf[Array[Byte]], hashes)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashes", hashes, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BloomExpressions.anyContained($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** JVM helper shared by eval and codegen. */
  def anyContained(bytes: Array[Byte], hashes: Array[Long]): Boolean = {
    val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    var i = 0
    while (i < hashes.length) {
      if (bf.mightContainLong(hashes(i))) return true
      i += 1
    }
    false
  }

  /** Aggregate Column: serialized Bloom filter of the group's non-null
    * long values (feed it `xxhash64`-style pre-hashes).
    */
  def bloom_bits_agg(c: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(
      BloomBitsAgg(ColumnBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())

  /** `true` when the serialized filter in `bits` might contain any of
    * `hashes` — never a false negative for values that were inserted.
    */
  def bloom_any(bits: Column, hashes: Seq[Long]): Column =
    ColumnBridge.column(
      BloomBytesMightContainAny(ColumnBridge.expression(bits),
        hashes.toArray))
}
