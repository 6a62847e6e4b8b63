package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.util.Random

/** Model-based DML fuzzing of the ACID table layer: seeded random
  * sequences of upsert / append / insertIfAbsent / deleteMatching
  * (classic + DV) / deleteWhere / updateWhere / overwriteWhere /
  * restore interleaved with maintenance (optimize, compactSmallFiles,
  * vacuum), checked after EVERY commit against a driver-side model
  * map — then the whole history is replayed via time travel and each
  * version must equal the model snapshot recorded when it committed.
  *
  * This is the composition coverage the pairwise specs don't give:
  * OccRebaseSpec proves races, ResourceTableSpec proves each verb,
  * the soak proves sustained concurrency — this proves that ARBITRARY
  * verb interleavings (delete-after-restore, replaceWhere over
  * DV-deleted rows, update of rows a restore resurrected, …) keep
  * snapshot state, stats counts, time travel and history linearity
  * exact. Same pattern as QueryFuzzSpec/ExportFuzzSpec: generate
  * wide, compare against an independent source of truth.
  */
class TableFuzzSpec extends SparkSpec {
  import graft.SparkSpec._

  private val nSeqs =
    sys.env.get("SPARK_GRAFT_TABLEFUZZ_N").map(_.toInt).getOrElse(12)
  private val stepsPerSeq = 14

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("seg", StringType)))

  private def df(rows: Seq[(Long, Long, String)], segName: String)
      : DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), math.max(1, 2)),
      StructType(Seq(
        StructField("id", LongType),
        StructField("v", LongType),
        StructField(segName, StringType))))

  test(s"$nSeqs seeded DML sequences match the model at every version") {
    (1 to nSeqs).foreach { seed =>
      val r = new Random(seed)
      val dir = tmpDir(s"tablefuzz_$seed")
      val t = ResourceTable(spark, s"$dir/t.parquet")
        .createIfNotExists(schema)
      if (r.nextBoolean()) t.enableDeletionVectors()
      t.enableColumnMapping() // rename ops require it (delta contract)

      val segs = Vector("A", "B", "C", "D")
      val model = mutable.Map.empty[Long, (Long, String)]
      // version → (model snapshot, live seg-column name) AT that
      // commit: RESTORE reverts the SCHEMA too (Delta semantics — a
      // rename is undone by restoring past it; the 100-seed campaign
      // caught the harness assuming otherwise), so the column name is
      // part of the restorable state.
      val snapshots = mutable.ArrayBuffer
        .empty[(Long, Map[Long, (Long, String)], String)]
      var fresh = 10000L // disjoint key range for append (append path has no dedup)
      var segName = "seg"

      def snap(): Unit =
        snapshots += ((t.latestVersion.get, model.toMap, segName))
      snap() // v0: empty table

      def randKeys(n: Int): Seq[Long] =
        Seq.fill(n)(r.nextInt(150).toLong).distinct

      (1 to stepsPerSeq).foreach { step =>
        r.nextInt(12) match {
          case 0 | 1 => // keyed upsert: insert + overwrite mix
            val rows = randKeys(12 + r.nextInt(20))
              .map(k => (k, step.toLong, segs(r.nextInt(4))))
            t.upsert(df(rows, segName), "id")
            rows.foreach { case (k, v, s) => model(k) = (v, s) }
            snap()
          case 2 => // append of guaranteed-fresh keys (no dedup path)
            val rows = (0 until 5 + r.nextInt(10)).map { i =>
              (fresh + i, step.toLong, segs(r.nextInt(4)))
            }
            fresh += 100
            t.append(df(rows, segName))
            rows.foreach { case (k, v, s) => model(k) = (v, s) }
            snap()
          case 3 => // insert-if-absent: present keys must NOT change
            val rows = randKeys(10 + r.nextInt(15))
              .map(k => (k, 9000L + step, segs(r.nextInt(4))))
            t.insertIfAbsent(df(rows, segName), "id")
            rows.foreach { case (k, v, s) =>
              if (!model.contains(k)) model(k) = (v, s)
            }
            snap()
          case 4 => // keyed delete — classic rewrite or DV route
            val ids = randKeys(8 + r.nextInt(12))
            val idsDf = df(ids.map(k => (k, 0L, "X")), segName).select("id")
            if (r.nextBoolean() && t.latestVersion.get > 0)
              t.deleteMatchingDv(idsDf, "id")
            else t.deleteMatching(idsDf, "id")
            ids.foreach(model.remove)
            snap()
          case 5 => // predicate delete
            val m = 2 + r.nextInt(4)
            t.deleteWhere(col("v") % m === 0)
            model.filterInPlace { case (_, (v, _)) => v % m != 0 }
            snap()
          case 6 => // predicate update (non-key columns)
            val sg = segs(r.nextInt(4))
            t.updateWhere(col(segName) === sg,
              Map("v" -> (col("v") + 1000L)))
            model.mapValuesInPlace { case (_, (v, s)) =>
              if (s == sg) (v + 1000L, s) else (v, s)
            }
            snap()
          case 7 => // replaceWhere: swap one segment's rows wholesale.
            // overwriteWhere has NO key semantics (it deletes by
            // predicate and inserts the source verbatim), so inserted
            // ids must be STEP-UNIQUE or a later replaceWhere can
            // legitimately duplicate an id another segment still holds
            // — which a key->value model cannot represent (first
            // fuzzer run tripped exactly that at seed 2 step 9).
            val sg = segs(r.nextInt(4))
            val rows = randKeys(5 + r.nextInt(8))
              .map(k => (k + 1000000L + step * 1000L, step.toLong, sg))
            t.overwriteWhere(col(segName) === sg, df(rows, segName))
            model.filterInPlace { case (_, (_, s)) => s != sg }
            rows.foreach { case (k, v, s) => model(k) = (v, s) }
            snap()
          case 8 => // restore to a random earlier version — content AND
            // schema (a rename restored past reverts the column name)
            val (v, ms, sn) = snapshots(r.nextInt(snapshots.size))
            t.restore(v)
            model.clear(); model ++= ms
            segName = sn
            snap()
          case 9 => // rename toggle: schema evolution mid-sequence.
            // Column mapping aliases physical names to the CURRENT
            // logical name on every read (incl. time travel), so the
            // positional model checks below are rename-transparent —
            // the op tests that DML/restore/time travel survive a
            // rename, not the rename itself (ColumnMappingSpec does).
            val next = if (segName == "seg") "segment" else "seg"
            t.renameColumn(segName, next)
            segName = next
            snap()
          case 10 => // CHECK constraint add/drop: every later write
            // path must evaluate it (values here always satisfy it,
            // so enforcement plumbing runs without refusals)
            if (t.checkConstraints().contains("v_nonneg"))
              t.dropCheckConstraint("v_nonneg")
            else t.addCheckConstraint("v_nonneg", "v >= 0")
            // constraint changes don't commit a data version in every
            // path — no snap; current-state checks below still run
          case _ => // maintenance: logical no-ops for the model
            r.nextInt(3) match {
              case 0 => t.optimize(numFiles = 2)
              case 1 => t.compactSmallFiles(minBytes = 1L << 20)
              case _ => t.vacuum(retentionMs = 3600L * 1000)
            }
            // no snap: dataChange=false commits (or no commit at all)
            // may or may not add a version; current-state checks below
            // still run
        }
        // after EVERY step: live snapshot equals the model exactly.
        // The raw row count is asserted too — the map collapse below
        // would otherwise hide a duplicated id (ids are unique by
        // construction here, so a duplicate is an engine bug).
        assert(t.read().count() == model.size.toLong,
          s"seed $seed step $step: row count != model size")
        val got = t.read().collect()
          .map(row => row.getLong(0) -> (row.getLong(1), row.getString(2)))
          .toMap
        assert(got == model.toMap,
          s"seed $seed step $step: snapshot diverged from model " +
            s"(got ${got.size} rows, want ${model.size})")
        // manifest stats agree with the model without reading data
        assert(t.statsCount() == model.size.toLong,
          s"seed $seed step $step: statsCount != model size")
      }

      // linear history: every version exists
      val head = t.latestVersion.get
      assert((0L to head).forall(t.versionExists),
        s"seed $seed: commit chain has gaps")
      // CDF algebraic completeness: for random recorded version pairs,
      // the keyed change feed must equal the model diff between the
      // two snapshots exactly — inserts/deletes plus pre/post image
      // PAIRS for changed keys (the q_incremental_agg contract, here
      // across arbitrary DML/schema-op/restore compositions)
      (1 to 3).foreach { _ =>
        val i = r.nextInt(snapshots.size)
        val j = r.nextInt(snapshots.size)
        val ((v1, m1, _), (v2, m2, _)) =
          if (snapshots(i)._1 <= snapshots(j)._1) (snapshots(i), snapshots(j))
          else (snapshots(j), snapshots(i))
        val expected = (m1.keySet ++ m2.keySet).toSeq.flatMap { k =>
          (m1.get(k), m2.get(k)) match {
            case (None, Some((v, s))) => Seq((k, v, s, "insert"))
            case (Some((v, s)), None) => Seq((k, v, s, "delete"))
            case (Some(a), Some(b)) if a != b =>
              Seq((k, a._1, a._2, "update_preimage"),
                (k, b._1, b._2, "update_postimage"))
            case _ => Seq.empty
          }
        }.toSet
        val got = t.changes(v1, v2, "id").collect().map { row =>
          (row.getLong(0), row.getLong(1), row.getString(2),
            row.getString(3))
        }.toSet
        assert(got == expected,
          s"seed $seed: changes($v1, $v2) diverged from the model diff " +
            s"(got ${got.size} events, want ${expected.size})")
      }

      // time travel: every recorded version replays to its snapshot
      snapshots.foreach { case (v, ms, _) =>
        val got = t.readVersion(v).collect()
          .map(row => row.getLong(0) -> (row.getLong(1), row.getString(2)))
          .toMap
        assert(got == ms,
          s"seed $seed: version $v time travel diverged " +
            s"(got ${got.size} rows, want ${ms.size})")
      }
    }
  }
}
