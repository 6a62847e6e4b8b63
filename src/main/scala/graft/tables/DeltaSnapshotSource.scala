package graft.tables

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** Spark datasource over an exported `_delta_log`
  * (`USING graft.tables.DeltaSnapshotSource OPTIONS (path '…')`, short
  * name `graft-delta`) — the persistence layer behind export-backed
  * catalog registration.
  *
  * A catalog entry for a fragmented [[ResourceTable]] snapshot cannot
  * enumerate files (the SQL body would grow with the table) and cannot
  * call a session table function (persistent objects may not reference
  * temporary ones). A DATASOURCE entry carries only this provider's
  * class name plus the table path: resolution happens here, at
  * analysis time, by replaying the exported log — the registration is
  * a static pointer over a moving snapshot, exactly the contract a
  * real Delta `LOCATION` gives external engines (delta-spark's own
  * DeltaDataSource resolves the same way). Each analysis replays
  * checkpoint + tail (O(tail)); after a new export, `REFRESH TABLE`
  * drops the session's cached relation, as with any file datasource.
  *
  * The fast path hands back the parquet `HadoopFsRelation` that
  * [[DeltaExport.readSnapshot]] plans (full codegen, pushdown,
  * pruning). Shapes that do not reduce to one file relation — an empty
  * snapshot, a partitioned foreign log's union — fall back to a
  * [[TableScan]] over the same DataFrame, trading scan pruning for
  * correctness on shapes registration rarely meets.
  */
class DeltaSnapshotSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String])
      : BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-delta: OPTIONS must carry a path"))
    val version = parameters.get("versionAsOf").map(_.toLong).getOrElse(-1L)
    val df = DeltaExport.readSnapshot(ctx.sparkSession, path, version)
    // the fast path applies ONLY when the analyzed plan IS a bare file
    // relation at the ROOT: collectFirst-anywhere would descend past
    // everything readSnapshot planned ABOVE the scan — the deletion-
    // vector anti-join (dead rows would resurface), the column-mapping
    // physical→logical restore Project (the entry would expose
    // physical names), the partitioned column-order Project — and hand
    // back the raw scan without them. Those shapes take the fallback,
    // which delegates the WHOLE DataFrame.
    df.queryExecution.analyzed match {
      case LogicalRelation(rel, _, _, _, _) => rel
      case _ => new DeltaSnapshotSource.FallbackScan(
        ctx.sparkSession, path, version, df.schema)
    }
  }
}

object DeltaSnapshotSource {
  /** Non-single-relation shapes: delegate the whole scan. */
  private final class FallbackScan(spark: SparkSession, path: String,
                                   version: Long, val schema: StructType)
      extends BaseRelation with TableScan {
    override def sqlContext: SQLContext = spark.sqlContext
    override def buildScan(): RDD[Row] =
      DeltaExport.readSnapshot(spark, path, version).rdd
  }
}
