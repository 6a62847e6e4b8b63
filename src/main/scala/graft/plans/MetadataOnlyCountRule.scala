package graft.plans

import graft.tables.StatsFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: answer an unfiltered, ungrouped `COUNT(*)` /
  * `MIN(col)` / `MAX(col)` over a manifest-backed table scan from the
  * manifest itself — Delta's metadata-only-query optimization
  * (`SELECT count(*) FROM tbl` never opens a data file there either).
  * Every [[StatsFileIndex]]-planned read (ResourceTable snapshots,
  * exported/foreign Delta logs) records per-file row counts and
  * column min/max in its manifest, so the aggregate collapses to a
  * [[LocalRelation]] with one precomputed row: at 100 TB this is a
  * millisecond manifest pass instead of a full scan.
  *
  * Scope is deliberately tight — the rewrite fires only when the
  * answer is PROVABLY the scan's output:
  *   - no grouping keys; every aggregate a literal-argument or star
  *     `count` (never null-sensitive `count(col)`), or `min`/`max`
  *     of a bare numeric column whose stats exist on every file
  *     (string stats refuse — writers may truncate them; DV-bearing
  *     files refuse — the extremal row may be dead);
  *   - the child is the bare relation, optionally under a
  *     column-pruning `Project` of plain attributes (projection does
  *     not change cardinality; a `Filter` anywhere blocks the rule);
  *   - every manifest entry carries stats
  *     ([[StatsFileIndex.exactRowCount]] is `None` otherwise);
  *   - DV tables are additionally safe BY CONSTRUCTION for counts:
  *     their reads plan the DV anti-join above the scan, so the
  *     aggregate is never directly over the relation (the physical
  *     row count IS the bare scan's cardinality);
  *   - column-mapped foreign logs are safe: their relations expose
  *     physical names under a restoring Project of ALIASES (blocks
  *     the match) or logical names whose stats lookup misses → None.
  *
  * Disabled with `graft.rules.metadataOnlyCount=false` (on by
  * default, like Delta). Registered by [[graft.GraftExtensions]].
  */
object MetadataOnlyCountRule extends Rule[LogicalPlan] {

  // a result-REWRITING rule must fail DISABLED on an unparseable conf
  // (same convention as RangeBinJoinRule): an operator killing the
  // rule mid-incident with "0"/"no"/"false " must not be ignored.
  // Only an UNSET conf defaults to enabled.
  private def enabled: Boolean =
    conf.getConfString("graft.rules.metadataOnlyCount", "true") match {
      case v => scala.util.Try(v.trim.toBoolean).getOrElse(false)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, child, _)
          if aggExprs.forall(isSupported) =>
        bareRelation(child) match {
          case Some(idx) =>
            // outputs correspond positionally to the aggregate list;
            // ANY un-provable value leaves the plan untouched
            val values = aggExprs.map(valueFor(_, idx))
            if (values.forall(_.isDefined))
              LocalRelation(agg.output,
                Seq(InternalRow.fromSeq(values.map(_.get))))
            else agg
          case None => agg
        }
      // GROUP BY partition columns + COUNT(*): per-group counts from
      // the manifest's partitionValues — Delta's partition-query leg
      // of OptimizeMetadataOnlyQuery. Grouping by a SUBSET of the
      // partition columns re-merges manifest groups here (plain fold,
      // no job). Groups follow SQL semantics: values absent from the
      // manifest produce no row; an empty table produces none.
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if groupExprs.nonEmpty &&
            groupExprs.forall(_.isInstanceOf[AttributeReference]) &&
            aggExprs.forall(e => isGroupOrCount(e, groupExprs)) =>
        bareRelation(child) match {
          case Some(idx)
              if groupExprs.forall(g =>
                idx.partitionSchema.fieldNames
                  .contains(g.asInstanceOf[AttributeReference].name)) =>
            idx.exactPartitionCounts match {
              case Some(partCounts) =>
                val gAttrs = groupExprs
                  .map(_.asInstanceOf[AttributeReference])
                val gIdx = gAttrs
                  .map(a => idx.partitionSchema.fieldIndex(a.name))
                val merged = scala.collection.mutable.LinkedHashMap
                  .empty[IndexedSeq[Any], Long]
                partCounts.foreach { case (row, c) =>
                  val kv: IndexedSeq[Any] = gIdx.map(i =>
                    row.get(i, idx.partitionSchema(i).dataType))
                    .toIndexedSeq
                  merged(kv) = merged.getOrElse(kv, 0L) + c
                }
                val rows = merged.toSeq.map { case (kv, c) =>
                  InternalRow.fromSeq(aggExprs.map {
                    case a: AttributeReference =>
                      kv(gAttrs.indexWhere(_.exprId == a.exprId))
                    case Alias(a: AttributeReference, _) =>
                      kv(gAttrs.indexWhere(_.exprId == a.exprId))
                    case Alias(AggregateExpression(Count(_), _, _, _, _),
                        _) => c
                    case Alias(l: Literal, _) => l.value
                    // non-exhaustive by design: isGroupOrCount guards
                  })
                }
                LocalRelation(agg.output, rows)
              case None => agg
            }
          case _ => agg
        }
    }
  }

  /** For the grouped form: each output is a group key (by exprId), a
    * literal-argument non-distinct COUNT, or a literal.
    */
  private def isGroupOrCount(e: NamedExpression,
                             groups: Seq[Expression]): Boolean = {
    def isKey(a: AttributeReference) = groups.exists {
      case g: AttributeReference => g.exprId == a.exprId
      case _ => false
    }
    e match {
      case a: AttributeReference => isKey(a)
      case Alias(a: AttributeReference, _) => isKey(a)
      case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete,
        false, None, _), _) => true
      case Alias(_: Literal, _) => true
      case _ => false
    }
  }

  /** The aggregate list permits `count(literal)` (covers count(*)
    * and count(1)), `min`/`max` of a plain numeric column, and
    * literal columns.
    */
  private def isSupported(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete,
      false, None, _), _) => true
    case Alias(AggregateExpression(Min(_: AttributeReference), Complete,
      false, None, _), _) => true
    case Alias(AggregateExpression(Max(_: AttributeReference), Complete,
      false, None, _), _) => true
    case Alias(_: Literal, _) => true
    case _ => false
  }

  /** The manifest's answer for one aggregate expression — None when
    * not provably exact (missing/non-numeric stats, DVs, or a column
    * type the stat values can't losslessly inhabit).
    */
  private def valueFor(e: NamedExpression,
                       idx: StatsFileIndex): Option[Any] = e match {
    case Alias(l: Literal, _) => Some(l.value)
    case Alias(AggregateExpression(Count(_), _, _, _, _), _) =>
      idx.exactRowCount
    case Alias(AggregateExpression(Min(a: AttributeReference),
        _, _, _, _), _) =>
      idx.exactMinMax(a.name).flatMap(b => convert(b._1, a))
    case Alias(AggregateExpression(Max(a: AttributeReference),
        _, _, _, _), _) =>
      idx.exactMinMax(a.name).flatMap(b => convert(b._2, a))
    case _ => None
  }

  /** Stat values arrive normalized to Long/Double (parquet footer
    * convention); fit them to the column's Catalyst type or refuse.
    */
  private def convert(v: Any, a: AttributeReference): Option[Any] =
    (v, a.dataType) match {
      case (null, _) => Some(null) // provably all-null → SQL NULL
      case (l: Long, LongType) => Some(l)
      case (l: Long, IntegerType) => Some(l.toInt)
      case (d: Double, DoubleType) => Some(d)
      case _ => None
    }

  /** The child's StatsFileIndex when it is a bare manifest-backed
    * relation, optionally under attribute-only Projects
    * (cardinality- and column-neutral).
    */
  private def bareRelation(plan: LogicalPlan): Option[StatsFileIndex] =
    plan match {
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        bareRelation(child)
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case idx: StatsFileIndex => Some(idx)
          case _ => None
        }
      case _ => None
    }
}
