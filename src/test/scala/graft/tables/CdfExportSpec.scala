package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CHANGE DATA FEED export: a CDF-enabled table's exported `_delta_log`
  * carries `cdc` actions + `_change_data/` files for every rewriting
  * commit, the protocol/metaData announce the feature, and the
  * INDEPENDENT python reader proves the algebraic replay identity
  *   snap(v-1) + inserts + postimages − deletes − preimages = snap(v)
  * for every cdc commit.
  */
class CdfExportSpec extends SparkSpec {
  import graft.SparkSpec._

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("n", IntegerType)))

  private def df(rows: (String, Int)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))),
      schema)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def entryActions(path: String, v: Long): Seq[String] =
    new String(Files.readAllBytes(
      Paths.get(path, "_delta_log", f"$v%020d.json")),
      StandardCharsets.UTF_8).linesIterator.toSeq

  test("cdc actions + change files for upsert-rewrite, DV delete, classic delete") {
    val dir = tmpDir("cdf1")
    val path = s"$dir/T.parquet"
    val t = ResourceTable(spark, path)
      .createIfNotExists(schema).enableChangeDataFeed()
    t.upsert(df((0 until 12).map(i => f"k$i%02d" -> i): _*), "id")
    DeltaExport.export(t) // anchor now: later exports replay per-commit
    // update 2 keys + insert 1 → a rewriting MERGE (pre/postimages)
    t.upsert(df("k03" -> 300, "k07" -> 700, "new" -> 13), "id")
    // classic rewrite delete (before DV enablement routes deletes)
    t.deleteMatching(df("k09" -> 0).select("id"), "id")
    // DV delete (zero rewrite, (path, dv) identity flip)
    t.enableDeletionVectors()
    t.deleteMatchingDv(df("k01" -> 0, "k05" -> 0).select("id"), "id")
    val dv = DeltaExport.export(t)
    assert(dv >= 3L) // anchor + the merge/delete/dv-delete commits

    // metaData announces the property; protocol carries the feature
    val all = (0L to dv).flatMap(entryActions(path, _))
    val meta = all.filter(_.contains("\"metaData\"")).map(mapper.readTree)
    assert(meta.exists(_.get("metaData").get("configuration")
      .get("delta.enableChangeDataFeed").asText == "true"))
    val protos = all.filter(_.contains("\"protocol\""))
      .map(mapper.readTree(_).get("protocol"))
    assert(protos.exists(p =>
      p.get("minWriterVersion").asInt == 4 ||
        Option(p.get("writerFeatures")).exists(_.elements().asScala
          .exists(_.asText == "changeDataFeed"))))

    // the MERGE-rewrite and the DV delete both carry cdc actions
    val cdcLines = all.filter(_.contains("\"cdc\""))
    assert(cdcLines.size >= 2, s"expected >=2 cdc actions:\n$all")
    cdcLines.map(mapper.readTree(_).get("cdc")).foreach { c =>
      assert(!c.get("dataChange").asBoolean)
      val p = Paths.get(path, c.get("path").asText)
      assert(Files.exists(p), s"missing change file $p")
    }
    // change types present: update pair + deletes + insert
    val cdcFiles = cdcLines.map(l =>
      s"$path/${mapper.readTree(l).get("cdc").get("path").asText}")
    val cts = spark.read.parquet(cdcFiles: _*)
      .select("_change_type").collect().map(_.getString(0)).toSet
    assert(cts == Set("insert", "delete",
      "update_preimage", "update_postimage"), cts.toString)

    // the independent python reader: snapshot MATCH + cdf identity OK
    t.read().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/expected.parquet")
    val pb = new ProcessBuilder("python3", "tools/check_delta_export.py",
      path, s"$dir/expected.parquet")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    proc.waitFor()
    assert(proc.exitValue() == 0, s"python reader failed:\n$out")
    assert(out.contains("cdc commits verified OK"), out)
    assert("cdf: (\\d+) cdc commits".r.findFirstMatchIn(out)
      .exists(_.group(1).toInt >= 2), out)
  }

  test("keyless RESTORE exports content-diff cdc (insert/delete images)") {
    val dir = tmpDir("cdf2")
    val path = s"$dir/T.parquet"
    val t = ResourceTable(spark, path)
      .createIfNotExists(schema).enableChangeDataFeed()
    t.upsert(df("a" -> 1, "b" -> 2), "id")
    DeltaExport.export(t) // anchor before the keyless commit
    val v1 = t.latestVersion.get
    t.upsert(df("b" -> 20, "c" -> 3), "id")
    t.restore(v1) // keyless commit: back to {a->1, b->2}
    val dv = DeltaExport.export(t)
    val all = (0L to dv).flatMap(entryActions(path, _))
    assert(all.exists(_.contains("\"cdc\"")), all.mkString("\n"))
    t.read().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/expected.parquet")
    val pb = new ProcessBuilder("python3", "tools/check_delta_export.py",
      path, s"$dir/expected.parquet")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    proc.waitFor()
    assert(proc.exitValue() == 0, s"python reader failed:\n$out")
    assert(out.contains("cdc commits verified OK"), out)
  }

  test("cleanupLog reaps change files with their aged entries, keeps referenced ones") {
    val dir = tmpDir("cdf4")
    val path = s"$dir/T.parquet"
    val t = ResourceTable(spark, path)
      .createIfNotExists(schema).enableChangeDataFeed()
    t.upsert(df((0 until 8).map(i => s"k$i" -> i): _*), "id")
    DeltaExport.export(t)
    // 11 rewriting commits → 11 cdc files; entry 10 forces a checkpoint
    (0 until 11).foreach(i =>
      t.upsert(df(s"k${i % 8}" -> (100 + i)), "id"))
    val dv = DeltaExport.export(t)
    assert(dv >= 10L)
    val cd = Paths.get(path, "_change_data")
    val before = Files.list(cd).iterator().asScala.size
    assert(before >= 11, s"$before")
    // age everything, then clean with zero retention: entries below the
    // checkpoint die and exactly their change files go with them
    Files.list(Paths.get(path, "_delta_log")).iterator().asScala
      .foreach(p => p.toFile.setLastModified(1000L))
    Files.list(cd).iterator().asScala
      .foreach(p => p.toFile.setLastModified(1000L))
    val dead = DeltaExport.cleanupLog(t, retentionMs = 0L)
    assert(dead.nonEmpty)
    val left = Files.list(cd).iterator().asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith(".")) // survivors' hadoop .crc sidecars
      .toSet
    // survivors = exactly the cdc paths the retained entries reference
    val retained = Files.list(Paths.get(path, "_delta_log"))
      .iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json")).toSeq
      .flatMap(p => Files.readAllLines(p).asScala)
      .filter(_.contains("\"cdc\""))
      .map(l => mapper.readTree(l).get("cdc").get("path").asText
        .stripPrefix("_change_data/")).toSet
    assert(left == retained, s"left=$left retained=$retained")
    // the replayed snapshot is untouched by the cleanup
    assert(DeltaExport.readSnapshot(spark, path).count() == 8L)
  }

  test("orphan change file (crash between cdc write and entry publish) is inert, then reaped") {
    val dir = tmpDir("cdf5")
    val path = s"$dir/T.parquet"
    val t = ResourceTable(spark, path)
      .createIfNotExists(schema).enableChangeDataFeed()
    t.upsert(df("a" -> 1, "b" -> 2), "id")
    DeltaExport.export(t)
    t.upsert(df("a" -> 10), "id")
    // simulate the crash window: a cdc file exists that NO entry
    // references (the exporter died before writeEntry)
    val cd = Paths.get(path, "_change_data")
    Files.createDirectories(cd)
    val orphan = cd.resolve("cdc-00000000000000000099-deadbeef.parquet")
    spark.range(1).toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/orphan_tmp")
    val part = Files.list(Paths.get(s"$dir/orphan_tmp")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, orphan)
    // re-export proceeds normally and writes its OWN fresh cdc file
    val dv = DeltaExport.export(t)
    val all = (0L to dv).flatMap(entryActions(path, _))
    val refd = all.filter(_.contains("\"cdc\""))
      .map(l => mapper.readTree(l).get("cdc").get("path").asText)
    assert(refd.nonEmpty && !refd.contains(
      "_change_data/cdc-00000000000000000099-deadbeef.parquet"))
    // the external reader ignores the orphan (it is referenced by
    // nothing) — snapshot + cdf checks stay green
    t.read().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/expected.parquet")
    val pb = new ProcessBuilder("python3", "tools/check_delta_export.py",
      path, s"$dir/expected.parquet")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    proc.waitFor()
    assert(proc.exitValue() == 0, s"reader failed on orphan:\n$out")
    // aged orphan dies at cleanup; the referenced file survives. A
    // checkpoint must exist for cleanup to anchor on — force entries
    // past the interval
    (0 until 10).foreach(i => t.upsert(df(s"x$i" -> i), "id"))
    DeltaExport.export(t)
    orphan.toFile.setLastModified(1000L)
    // 1h retention: the epoch-aged orphan is past the cutoff, every
    // real (fresh) change file is inside it and referenced anyway
    DeltaExport.cleanupLog(t, retentionMs = 3600L * 1000)
    assert(!Files.exists(orphan), "aged orphan must be reaped")
  }

  test("CDF off: no cdc actions, no _change_data, protocol unchanged") {
    val dir = tmpDir("cdf3")
    val path = s"$dir/T.parquet"
    val t = ResourceTable(spark, path).createIfNotExists(schema)
    t.upsert(df("a" -> 1, "b" -> 2), "id")
    t.upsert(df("a" -> 10), "id") // rewrite, but CDF not enabled
    val dv = DeltaExport.export(t)
    val all = (0L to dv).flatMap(entryActions(path, _))
    assert(!all.exists(_.contains("\"cdc\"")))
    assert(!Files.exists(Paths.get(path, "_change_data")))
    assert(!all.exists(_.contains("changeDataFeed")))
  }

  test("cdc physical naming survives chained renames where a logical name equals another column's physical name") {
    // the hazard: schema (id, n) under mapping, rename id->w then
    // n->id — now logical "w" has physical "id" while logical "id"
    // has physical "n". A SEQUENTIAL logical->physical rename
    // (withColumnRenamed w->id while a logical "id" still exists)
    // duplicates a column name and the next rename hits both; the
    // one-projection rename in writeChangeData must stay immune.
    val dir = tmpDir("cdf5")
    val path = s"$dir/T.parquet"
    val t = ResourceTable(spark, path)
      .createIfNotExists(schema).enableChangeDataFeed()
      .enableColumnMapping()
    t.upsert(df("k1" -> 1, "k2" -> 2, "k3" -> 3), "id")
    DeltaExport.export(t) // anchor: later exports replay per-commit
    t.renameColumn("id", "w")
    t.renameColumn("n", "id")
    // post-rename rewriting commits: an update pair and a delete,
    // both materialize _change_data files under the swapped names
    val post = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row("k2", 20), Row("k4", 4))),
      StructType(Seq(StructField("w", StringType),
        StructField("id", IntegerType))))
    t.upsert(post, "w")
    t.deleteWhere(org.apache.spark.sql.functions.col("w") === "k1")
    val dv = DeltaExport.export(t)

    // every cdc file written after the swap carries DISTINCT PHYSICAL
    // names (id for logical w, n for logical id) — no duplicate
    // columns, no leakage of post-rename logical names
    val all = (0L to dv).flatMap(entryActions(path, _))
    val cdcFiles = all.filter(_.contains("\"cdc\""))
      .map(l => s"$path/${mapper.readTree(l).get("cdc").get("path").asText}")
    assert(cdcFiles.size >= 2, all.mkString("\n")) // post-swap upsert + delete
    cdcFiles.foreach { fpath =>
      val cols = spark.read.parquet(fpath).columns.toSeq
      assert(cols.distinct == cols, s"$fpath duplicated columns: $cols")
      assert(cols.contains("id") && cols.contains("n"),
        s"$fpath expected physical id/n, got $cols")
      assert(!cols.contains("w"), s"$fpath leaked logical name: $cols")
    }

    // the independent python reader replays the whole feed under the
    // swapped mapping and the snapshot round-trips
    t.read().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/expected.parquet")
    val pb = new ProcessBuilder("python3", "tools/check_delta_export.py",
      path, s"$dir/expected.parquet")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    proc.waitFor()
    assert(proc.exitValue() == 0, s"python reader failed:\n$out")
    assert(out.contains("cdc commits verified OK"), out)
  }

  test("cdc for commits exported AFTER a later rename still stores " +
      "physical names") {
    // the other half of the rename hazard: the cdc-bearing commits
    // happen FIRST, the rename later, and ONE export replays both.
    // ResourceTable.changes reads historical files under the LIVE
    // logical names, so writeChangeData's rename map must be keyed by
    // the live schema — keying by the schema AT the cdc commit would
    // miss the renamed column and leak the post-rename LOGICAL name
    // into the change file (unreadable by a spec-conformant reader).
    val dir = tmpDir("cdf6")
    val path = s"$dir/T.parquet"
    val t = ResourceTable(spark, path)
      .createIfNotExists(schema).enableChangeDataFeed()
      .enableColumnMapping()
    t.upsert(df("k1" -> 1, "k2" -> 2, "k3" -> 3), "id")
    DeltaExport.export(t) // anchor: later exports replay per-commit
    t.upsert(df("k2" -> 20), "id") // update pair -> cdc
    t.deleteWhere(org.apache.spark.sql.functions.col("id") === "k1")
    t.renameColumn("n", "val") // AFTER the cdc commits
    val dv = DeltaExport.export(t)

    // every cdc file carries the PHYSICAL name "n", never the
    // post-rename logical "val"
    val all = (0L to dv).flatMap(entryActions(path, _))
    val cdcFiles = all.filter(_.contains("\"cdc\""))
      .map(l => s"$path/${mapper.readTree(l).get("cdc").get("path").asText}")
    assert(cdcFiles.size >= 2, all.mkString("\n"))
    cdcFiles.foreach { fpath =>
      val cols = spark.read.parquet(fpath).columns.toSeq
      assert(cols.contains("n"), s"$fpath expected physical n: $cols")
      assert(!cols.contains("val"), s"$fpath leaked logical name: $cols")
    }

    // the independent python reader (whose proj_for REFUSES
    // logical-name leaks in mapped files) replays the feed
    t.read().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/expected.parquet")
    val pb = new ProcessBuilder("python3", "tools/check_delta_export.py",
      path, s"$dir/expected.parquet")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    proc.waitFor()
    assert(proc.exitValue() == 0, s"python reader failed:\n$out")
    assert(out.contains("cdc commits verified OK"), out)
  }
}
