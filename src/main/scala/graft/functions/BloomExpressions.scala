package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType,
  DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
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

  /** Shared eval body / static codegen target: the DISTINCT width-`n`
    * character shingles of `s` the filter admits, in first-occurrence
    * order — elementwise what
    * `filter(array_distinct(<all shingles>), sh -> might_contain(sh))`
    * computes, WITHOUT materializing the full shingle array (25 KB+
    * per KB of text) or paying the interpreted higher-order-function
    * path per element. Two byte pointers stream the text once (each
    * advances one UTF-8 char per window — O(bytes), not O(chars·n));
    * each window is hashed IN PLACE ([[XXH64.hashUnsafeBytes]] over
    * the text's own buffer — bit-identical to `xxhash64(sh)` on the
    * filter's build side) and only admitted windows allocate: for the
    * clean bulk of a corpus the loop allocates NOTHING and returns a
    * shared empty array.
    */
  def admittedShinglesEval(s: UTF8String, n: Int,
                           bf: BloomFilter): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val total = s.numBytes()
    var startB = 0
    var endB = 0
    var c = 0
    while (c < n && endB < total) {
      endB += UTF8String.numBytesForFirstByte(
        Platform.getByte(base, off + endB))
      c += 1
    }
    // a truncated multi-byte tail can overshoot — clamp so the hash
    // and the materialized window never read past the buffer
    if (endB > total) endB = total
    if (c < n) return EmptyStringArray
    var out: java.util.ArrayList[AnyRef] = null
    var seen: java.util.HashSet[UTF8String] = null
    var done = false
    while (!done) {
      val len = endB - startB
      if (bf.mightContainLong(
          XXH64.hashUnsafeBytes(base, off + startB, len, 42L))) {
        // clone: the window is a view over a buffer the scan reuses
        val sh = UTF8String.fromAddress(base, off + startB, len).clone()
        if (seen == null) {
          seen = new java.util.HashSet[UTF8String]()
          out = new java.util.ArrayList[AnyRef]()
        }
        if (seen.add(sh)) out.add(sh)
      }
      if (endB >= total) done = true
      else {
        startB += UTF8String.numBytesForFirstByte(
          Platform.getByte(base, off + startB))
        endB += UTF8String.numBytesForFirstByte(
          Platform.getByte(base, off + endB))
        if (endB > total) endB = total
      }
    }
    if (out == null) EmptyStringArray
    else new GenericArrayData(out.toArray)
  }

  private val EmptyStringArray: ArrayData =
    new GenericArrayData(Array.empty[Any])

  case class BloomAdmittedShingles(child: Expression, n: Int,
                                   bf: BloomFilter)
      extends UnaryExpression {
    require(n >= 1)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      admittedShinglesEval(v.asInstanceOf[UTF8String], n, bf)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bf,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.BloomExpressions" +
          s".admittedShinglesEval($c, $n, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** The distinct width-`n` character shingles of `text` admitted by
    * `bf` — the scan side of Bloom-gated decontamination as ONE
    * codegen'd projection column (see [[admittedShinglesEval]]).
    */
  def bloom_admitted_shingles(bf: BloomFilter, text: Column,
                              n: Int): Column =
    ColumnBridge.column(
      BloomAdmittedShingles(ColumnBridge.expression(text), n, bf))

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
