package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
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
}
