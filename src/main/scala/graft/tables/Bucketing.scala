package graft.tables

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location: pre-shuffle both sides of a recurring
  * equi-join ONCE at write time (`bucketBy` on the join key), so every
  * later join of the two tables is exchange-free — Spark reads
  * matching buckets side by side instead of shuffling either input.
  *
  * This is the storage-layout answer to the biggest cost at 100 TB:
  * a fact-fact join's full-table shuffle. Bucket counts should match
  * between tables (or be multiples, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`); bucket + sort
  * by the key also makes the join a zipper merge of pre-sorted files.
  */
object Bucketing {

  /** JVM-unique tag baked into every table name this object writes:
    * two sessions pointed at the same warehouse dir each get their own
    * table location, so neither can drop/delete the other's live
    * bucketed files mid-join. Within one JVM, re-runs reuse the tag and
    * the idempotent overwrite only ever touches this run's own dirs.
    */
  private val runTag =
    java.util.UUID.randomUUID().toString.take(8)

  /** Per-run unique catalog name for a logical table name. */
  def scopedName(name: String): String = s"${name}_$runTag"

  /** Write both sides into the session catalog bucketed (and sorted)
    * by the shared join key, then return the co-located join of the
    * two bucketed tables. With broadcast disabled, the physical plan
    * is a SortMergeJoin with NO Exchange on either side (see
    * PlanSpec's bucketed-join audit). Names are scoped per-run — pass
    * logical names, not catalog-unique ones.
    */
  def bucketedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                       buckets: Int, leftName: String,
                       rightName: String): DataFrame = {
    val spark = left.sparkSession
    val (l, r) = (scopedName(leftName), scopedName(rightName))
    writeBucketed(left, key, buckets, l)
    writeBucketed(right, key, buckets, r)
    spark.table(l).join(spark.table(r), key)
  }

  /** Save `df` as a bucketed+sorted catalog table (idempotent
    * overwrite). One write-side shuffle now, zero join-side shuffles
    * forever after.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
                    name: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // a leftover warehouse dir from a previous session blocks CREATE
    // even after DROP — the fresh in-memory catalog never owned it.
    // Spark LOWERCASES table identifiers (SessionCatalog
    // formatTableName), so the dir to probe is the lowercased name; a
    // mixed-case caller would otherwise check a path that never exists
    val loc = new HPath(spark.conf.get("spark.sql.warehouse.dir"),
      name.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }
}
