package graft.plans

import graft.tables.StatsFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: answer an unfiltered, ungrouped `COUNT(*)` over a
  * manifest-backed table scan from the manifest itself — Delta's
  * metadata-only-query optimization (`SELECT count(*) FROM tbl` never
  * opens a data file there either). Every [[StatsFileIndex]]-planned
  * read (ResourceTable snapshots, exported/foreign Delta logs) records
  * per-file row counts in its manifest, so the aggregate collapses to
  * a [[LocalRelation]] with one precomputed row: at 100 TB this is a
  * millisecond manifest pass instead of a full scan.
  *
  * Scope is deliberately tight — the rewrite fires only when the
  * answer is PROVABLY the scan's output:
  *   - no grouping keys, every aggregate a literal-argument or
  *     star `count` (`count(*)`, `count(1)`) — never `count(col)`
  *     (null-sensitive) or any other function;
  *   - the child is the bare relation, optionally under a
  *     column-pruning `Project` of plain attributes (projection does
  *     not change cardinality; a `Filter` anywhere blocks the rule);
  *   - every manifest entry carries stats
  *     ([[StatsFileIndex.exactRowCount]] is `None` otherwise);
  *   - deletion-vector tables are safe BY CONSTRUCTION: their reads
  *     plan the DV anti-join above the scan, so the aggregate is
  *     never directly over the relation and the pattern cannot match
  *     (the physical row count IS the bare scan's cardinality).
  *
  * Disabled with `graft.rules.metadataOnlyCount=false` (on by
  * default, like Delta). Registered by [[graft.GraftExtensions]].
  */
object MetadataOnlyCountRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    scala.util.Try(conf.getConfString(
      "graft.rules.metadataOnlyCount", "true").toBoolean).getOrElse(true)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, child, _)
          if aggExprs.forall(isCountStarOrLiteral) =>
        bareRelationRows(child) match {
          case Some(n) =>
            // outputs correspond positionally to the aggregate list:
            // counts become n, constant columns keep their literal
            val row = InternalRow.fromSeq(aggExprs.map {
              case Alias(l: Literal, _) => l.value
              case _ => n
            })
            LocalRelation(agg.output, Seq(row))
          case None => agg
        }
    }
  }

  /** The aggregate list permits only `count(literal)` (covers
    * count(*) and count(1)) and plain literal columns.
    */
  private def isCountStarOrLiteral(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete,
      false, None, _), _) => true
    case Alias(_: Literal, _) => true
    case _ => false
  }

  /** Row count of the child when it is a bare StatsFileIndex relation,
    * optionally under attribute-only Projects (cardinality-neutral).
    */
  private def bareRelationRows(plan: LogicalPlan): Option[Long] =
    plan match {
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        bareRelationRows(child)
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case idx: StatsFileIndex => idx.exactRowCount
          case _ => None
        }
      case _ => None
    }
}
