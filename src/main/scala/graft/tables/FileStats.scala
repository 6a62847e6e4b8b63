package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Per-file column statistics for data skipping — the engine-side
  * analogue of Delta's per-file stats (`delta.checkpoint.writeStatsAsStruct`,
  * reference bundle_processor.py:188–195): ResourceTable commits record
  * min/max/nullCount per top-level scalar column, and filtered reads
  * prune whole files whose stats prove no row can match.
  *
  * Stats come from the parquet FOOTERS of the just-written snapshot —
  * row groups already carry typed min/max, so collection is a
  * metadata-only read (no second data scan). Micro-batch commits read
  * footers on the driver (a handful of RPCs); above a file-count
  * threshold [[readFooters]] lifts the same loop into a Spark job, so
  * a 10k-file backfill commit scales with the cluster, not the driver.
  *
  * Skipping is CONSERVATIVE: any expression shape, type pairing, or
  * missing statistic we cannot reason about keeps the file. String
  * comparisons only skip when both operands are pure ASCII (parquet
  * orders binary stats by unsigned byte, which matches code-point order
  * exactly there); the row-level filter is always re-applied after the
  * scan, so pruning can never change results — only IO.
  */
object FileStats {

  /** min/max live in a small normalized domain: Long (ints, dates as
    * epoch days, timestamps as epoch micros), Double, or String.
    */
  final case class ColStats(min: Option[Any], max: Option[Any],
                            numNulls: Option[Long])
  /** Deletion vector attached to one manifest file: same shape as the
    * Delta descriptor ([[DeletionVectors.Descriptor]]) so export is a
    * verbatim translation. `st` is the storage type (`i` inline z85 /
    * `u` sidecar), `d` the payload, `card` the deleted-row count.
    * `rows` in [[FileStat]] stays the file's PHYSICAL row count (the
    * stats describe the parquet file; the live count is
    * rows − dv.card), matching Delta's own numRecords convention.
    */
  final case class DvInfo(st: String, d: String, off: Int, sz: Int,
                          card: Long) {
    def descriptor: graft.tables.DeletionVectors.Descriptor =
      graft.tables.DeletionVectors.Descriptor(st, d, off, sz, card)
  }

  /** `bytes` is the file's physical length, recorded at commit time so
    * size-driven upkeep (auto-compact gate, size-targeted compaction,
    * DESCRIBE DETAIL) never needs an FS listing; `None` only in
    * pre-bytes commit bodies, whose readers fall back to listing.
    * `mtime` is the file's modification time at commit, so snapshot
    * reads surface a real `_metadata.file_modification_time` without
    * any per-file status probe; `None` in pre-mtime commit bodies.
    * `dv` marks rows deleted IN PLACE (O(deleted rows) deletes): scans
    * drop the DV's positions, rewrites materialize survivors and clear
    * it.
    */
  /** `baseRowId`/`rowVer` are Delta ROW TRACKING metadata (PROTOCOL.md
    * "Row Tracking"): when the table opts in, every file is assigned a
    * fresh id range at commit — row i of the file has row id
    * `baseRowId + i` — and `rowVer` records the commit version that
    * added the file (Delta's defaultRowCommitVersion). Both ride the
    * manifest entry so rewrite paths carry them untouched (st.copy).
    */
  final case class FileStat(rows: Long, cols: Map[String, ColStats],
                            bytes: Option[Long] = None,
                            mtime: Option[Long] = None,
                            dv: Option[DvInfo] = None,
                            baseRowId: Option[Long] = None,
                            rowVer: Option[Long] = None)

  // ---------------- collection (parquet footer → FileStat) -----------

  def readFooter(conf: Configuration, file: HPath): FileStat =
    readFooter(conf, file.getFileSystem(conf).getFileStatus(file))

  /** Footer stats from an already-listed status — the commit path has
    * one from its output-dir listing, so going through the status
    * costs no extra RPC and fills `mtime` for free.
    */
  def readFooter(conf: Configuration,
                 status: org.apache.hadoop.fs.FileStatus): FileStat = {
    val input = HadoopInputFile.fromStatus(status, conf)
    val reader = ParquetFileReader.open(input)
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      // column → per-row-group stats, merged; a single unusable row
      // group poisons that column (None) — never guess
      var merged = Map.empty[String, Option[ColStats]]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          if (!name.contains('.')) {
            val next = toColStats(cc)
            merged += (name -> ((merged.get(name), next) match {
              case (None, n) => n
              case (Some(None), _) | (_, None) => None
              case (Some(Some(a)), Some(b2)) => mergeStats(a, b2)
            }))
          }
        }
      }
      FileStat(rows, merged.collect { case (k, Some(v)) => k -> v },
        bytes = Some(input.getLength),
        mtime = Some(status.getModificationTime))
    } finally reader.close()
  }

  private def toColStats(
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData)
      : Option[ColStats] = {
    val st = cc.getStatistics
    if (st == null) return None
    val nulls = if (st.isNumNullsSet) Some(st.getNumNulls) else None
    if (!st.hasNonNullValue)
      // distinguish a provably ALL-NULL chunk (every value null:
      // min/max undefined but the absence is known) from stats that
      // were simply NOT COLLECTED — parquet-mr hands back an EMPTY
      // Statistics object when min/max were dropped (over the stats
      // size cap, or flagged corrupt), and reading that as "no values
      // here" would skip files whose real values are unknown
      return if (st.isNumNullsSet && st.getNumNulls == cc.getValueCount)
        Some(ColStats(None, None, nulls))
      else None
    val ann = cc.getPrimitiveType.getLogicalTypeAnnotation
    val isString = ann match {
      case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => true
      case _ => false
    }
    // the compare domain stores timestamps as epoch MICROS (Spark's
    // TimestampType literals): MILLIS-annotated INT64 stats rescale,
    // MICROS pass through, NANOS pass through UNSCALED because Spark
    // only reads them via nanosAsLong (LongType column → raw-nanos
    // literals, the same domain). Unsigned ints are incomparable as
    // signed longs — refuse.
    def tsScale(l: Long): Option[Long] = ann match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS =>
            // abs-free bound check: math.abs(Long.MinValue) is
            // negative, which would let MinValue slip past an
            // abs-based guard and overflow into a corrupt stat.
            if (l > Long.MaxValue / 1000 || l < Long.MinValue / 1000) None
            else Some(l * 1000L)
          case _ => Some(l) // MICROS exact; NANOS = nanosAsLong domain
        }
      case u: LogicalTypeAnnotation.IntLogicalTypeAnnotation
          if !u.isSigned => None
      case _ => Some(l)
    }
    def norm(v: Any): Option[Any] = v match {
      case i: java.lang.Integer => tsScale(i.longValue)
      case l: java.lang.Long => tsScale(l.longValue)
      case f: java.lang.Float => Some(f.doubleValue)
      case d: java.lang.Double => Some(d.doubleValue)
      case b: Binary if isString => Some(b.toStringUsingUTF8)
      case _ => None
    }
    (norm(st.genericGetMin), norm(st.genericGetMax)) match {
      case (Some(mn), Some(mx)) => Some(ColStats(Some(mn), Some(mx), nulls))
      case _ => None
    }
  }

  /** Footer stats for a commit's new files — serial on the driver for
    * the common micro-batch shape (a handful of files: one metadata
    * RPC each, no job-scheduling overhead), lifted into a Spark job
    * above `distributedThreshold` files so a 10k-file commit (large
    * backfill, wide repartition) never serializes 10k footer reads on
    * the driver. Results are identical by construction: both paths run
    * the same [[readFooter]] per status (the hadoop Configuration is
    * shipped via its own Writable round trip so foreign-FS settings —
    * s3a endpoints, auth providers — reach the executors too).
    * Keyed by the file NAME (commit manifests key `dirName/fileName`,
    * and every status here comes from one listing of one directory).
    */
  def readFooters(spark: org.apache.spark.sql.SparkSession,
                  conf: Configuration,
                  statuses: Seq[org.apache.hadoop.fs.FileStatus],
                  distributedThreshold: Int): Map[String, FileStat] =
    if (statuses.size <= distributedThreshold)
      statuses.map(st => st.getPath.getName -> readFooter(conf, st)).toMap
    else {
      val confBytes = {
        val baos = new java.io.ByteArrayOutputStream()
        conf.write(new java.io.DataOutputStream(baos))
        baos.toByteArray
      }
      val sc = spark.sparkContext
      val parallelism = math.min(statuses.size,
        math.max(1, sc.defaultParallelism))
      sc.parallelize(statuses, parallelism)
        .mapPartitions { it =>
          // one Configuration rebuild per task, not per file
          val c = new Configuration(false)
          c.readFields(new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(confBytes)))
          it.map(st => st.getPath.getName -> readFooter(c, st))
        }
        .collect().toMap
    }

  private def mergeStats(a: ColStats, b: ColStats): Option[ColStats] = {
    def pick(x: Option[Any], y: Option[Any], wantMin: Boolean): Option[Option[Any]] =
      (x, y) match {
        case (None, o) => Some(o)
        case (o, None) => Some(o)
        case (Some(v1), Some(v2)) => cmp(v1, v2) match {
          case Some(c) => Some(Some(if ((c <= 0) == wantMin) v1 else v2))
          case None => None // incomparable across groups → poison
        }
      }
    for {
      mn <- pick(a.min, b.min, wantMin = true)
      mx <- pick(a.max, b.max, wantMin = false)
    } yield ColStats(mn, mx,
      for (n1 <- a.numNulls; n2 <- b.numNulls) yield n1 + n2)
  }

  // ---------------- JSON round-trip (commit-log embedding) -----------

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
  private val mapper = new ObjectMapper()

  def toJsonNode(stats: Map[String, FileStat]): ObjectNode = {
    val f = JsonNodeFactory.instance
    val root = f.objectNode()
    stats.foreach { case (file, fsStat) =>
      val fo = f.objectNode()
      fo.put("rows", fsStat.rows)
      fsStat.bytes.foreach(fo.put("bytes", _))
      fsStat.mtime.foreach(fo.put("mtime", _))
      fsStat.baseRowId.foreach(fo.put("brid", _))
      fsStat.rowVer.foreach(fo.put("rcv", _))
      fsStat.dv.foreach { d =>
        val dn = f.objectNode()
        dn.put("st", d.st); dn.put("d", d.d); dn.put("off", d.off)
        dn.put("sz", d.sz); dn.put("card", d.card)
        fo.replace("dv", dn)
      }
      val cols = f.objectNode()
      fsStat.cols.foreach { case (c, cs) =>
        val co = f.objectNode()
        def put(key: String, v: Option[Any]): Unit = v.foreach {
          case l: Long => co.put(key, l)
          case d: Double => co.put(key, d)
          case s: String => co.put(key, s)
          case _ => ()
        }
        put("min", cs.min); put("max", cs.max)
        cs.numNulls.foreach(co.put("nulls", _))
        cols.replace(c, co)
      }
      fo.replace("cols", cols)
      root.replace(file, fo)
    }
    root
  }

  /** The snapshot dir name a commit body points to. */
  def dirOf(body: String): Option[String] =
    Option(mapper.readTree(body).get("dir")).map(_.asText)

  /** The schema JSON a commit body embeds (absent in pre-schema-field
    * commits, whose readers fall back to `_meta_schema.json`).
    */
  def schemaOf(body: String): Option[String] =
    Option(mapper.readTree(body).get("schema")).map(_.toString)

  /** Operation name / wall-clock millis newer commits embed (DESCRIBE
    * HISTORY surface); absent in older commit bodies.
    */
  def opOf(body: String): Option[String] =
    Option(mapper.readTree(body).get("op")).map(_.asText)

  /** The commit's explicit dataChange marker (absent in legacy
    * commits — callers fall back to the OPTIMIZE op-label heuristic
    * there). `false` = a rearrangement: same logical rows, different
    * files — CDF diffs and delta exports must not surface its
    * add/removes as data.
    */
  def dcOf(body: String): Option[Boolean] =
    Option(mapper.readTree(body).get("dataChange")).map(_.asBoolean)

  /** The merge/delete KEY COLUMN a mutation commit recorded (absent in
    * pre-key commits and key-less ops like OPTIMIZE) — what a CDF
    * export needs to replay the commit's row-level changes.
    */
  def keyOf(body: String): Option[String] =
    Option(mapper.readTree(body).get("key")).map(_.asText)

  /** JSON string literal (quotes + escaping) via jackson. */
  def quoteJson(s: String): String =
    JsonNodeFactory.instance.textNode(s).toString

  /** Writer-transaction watermarks the commit carries (Delta's
    * `txnAppId`/`txnVersion` idempotence mechanism): appId → highest
    * batch id applied. Carried forward commit-to-commit so a replayed
    * foreachBatch append can be recognized and skipped.
    */
  def txnsOf(body: String): Map[String, Long] =
    Option(mapper.readTree(body).get("txns")).filter(_.isObject)
      .map(_.fields().asScala
        .map(e => e.getKey -> e.getValue.asLong).toMap)
      .getOrElse(Map.empty)

  def txnsToJson(txns: Map[String, Long]): String = {
    val o = JsonNodeFactory.instance.objectNode()
    txns.foreach { case (k, v) => o.put(k, v) }
    o.toString
  }

  def tsOf(body: String): Option[Long] =
    Option(mapper.readTree(body).get("ts")).map(_.asLong)

  /** Row-id high-water mark a commit body carries (row tracking):
    * every id below it is spoken for, forever — rewrites and deletes
    * never lower it.
    */
  def rowHwmOf(body: String): Option[Long] =
    Option(mapper.readTree(body).get("rowHwm")).map(_.asLong)

  /** Streaming commit reader — the scale twin of [[fromJson]]. A 100 TB
    * table's head manifest can reference 10⁶–10⁷ files; materializing
    * that as a driver Map (fromJson) costs O(live files) resident
    * objects before a single predicate prunes anything. This reader
    * parses the commit body INCREMENTALLY off an InputStream: header
    * fields (version/op/ts/dir/schema/txns) eagerly — they precede
    * `files`, which [[graft.tables]] commit writers always emit LAST —
    * and the per-file manifest as a one-shot iterator that holds
    * exactly one entry at a time. A planner folding filters over the
    * iterator retains only surviving files: driver peak is O(files the
    * predicate can touch), not O(table). Value typing mirrors
    * fromJson exactly (integral→Long, floating→Double, else text) so
    * both paths feed [[canSkip]] the same compare domain.
    */
  final class CommitStream(open: () => java.io.InputStream)
      extends AutoCloseable {
    import com.fasterxml.jackson.core.{JsonParser, JsonToken}

    private val parser: JsonParser = mapper.getFactory.createParser(open())
    private var atFiles = false
    private var filesTaken = false

    var dir: Option[String] = None
    var schemaJson: Option[String] = None
    var ts: Option[Long] = None
    var op: Option[String] = None

    // header parse: everything up to (and excluding) the files body.
    // A malformed body throws out of the CONSTRUCTOR — close the
    // parser (and its underlying stream) on the way out, since the
    // caller never gets a reference to close()
    try {
      if (parser.nextToken() != JsonToken.START_OBJECT)
        throw new IllegalStateException("commit body is not a JSON object")
      var headerDone = false
      while (!headerDone) {
        parser.nextToken() match {
          case JsonToken.FIELD_NAME => parser.currentName() match {
            case "files" =>
              if (parser.nextToken() != JsonToken.START_OBJECT)
                throw new IllegalStateException("files is not an object")
              atFiles = true; headerDone = true
            case "dir" => parser.nextToken(); dir = Some(parser.getText)
            case "schema" =>
              parser.nextToken()
              schemaJson = Some(mapper.readTree[JsonNode](parser).toString)
            case "ts" => parser.nextToken(); ts = Some(parser.getLongValue)
            case "op" => parser.nextToken(); op = Some(parser.getText)
            case _ => parser.nextToken(); parser.skipChildren()
          }
          case JsonToken.END_OBJECT | null => headerDone = true
          case t => throw new IllegalStateException(s"unexpected token $t")
        }
      }
    } catch {
      case e: Throwable =>
        try parser.close() catch { case _: Throwable => () }
        throw e
    }

    /** The per-file manifest, streamed. One-shot: entries are produced
      * straight off the parser, never retained here.
      */
    def files: Iterator[(String, FileStat)] = {
      require(!filesTaken, "CommitStream.files is one-shot")
      filesTaken = true
      if (!atFiles) Iterator.empty
      else new Iterator[(String, FileStat)] {
        private var nextItem: (String, FileStat) = _
        private var done = false
        advance()
        private def advance(): Unit = {
          parser.nextToken() match {
            case JsonToken.FIELD_NAME =>
              val rel = parser.currentName()
              if (parser.nextToken() != JsonToken.START_OBJECT)
                throw new IllegalStateException(s"file $rel: not an object")
              nextItem = rel -> readFileStat()
            case _ => done = true; nextItem = null
          }
        }
        override def hasNext: Boolean = !done
        override def next(): (String, FileStat) = {
          if (done) throw new NoSuchElementException
          val r = nextItem; advance(); r
        }
      }
    }

    private def readFileStat(): FileStat = {
      var rows = 0L; var bytes: Option[Long] = None
      var mtime: Option[Long] = None
      var dv: Option[DvInfo] = None
      var cols = Map.empty[String, ColStats]
      var brid: Option[Long] = None
      var rcv: Option[Long] = None
      var end = false
      while (!end) parser.nextToken() match {
        case JsonToken.FIELD_NAME => parser.currentName() match {
          case "rows" => parser.nextToken(); rows = parser.getLongValue
          case "bytes" =>
            parser.nextToken(); bytes = Some(parser.getLongValue)
          case "mtime" =>
            parser.nextToken(); mtime = Some(parser.getLongValue)
          case "brid" =>
            parser.nextToken(); brid = Some(parser.getLongValue)
          case "rcv" =>
            parser.nextToken(); rcv = Some(parser.getLongValue)
          case "dv" =>
            if (parser.nextToken() != JsonToken.START_OBJECT)
              throw new IllegalStateException("dv is not an object")
            var st = ""; var d = ""; var off = 0; var sz = 0
            var card = 0L
            var dvEnd = false
            while (!dvEnd) parser.nextToken() match {
              case JsonToken.FIELD_NAME => parser.currentName() match {
                case "st" => parser.nextToken(); st = parser.getText
                case "d" => parser.nextToken(); d = parser.getText
                case "off" => parser.nextToken(); off = parser.getIntValue
                case "sz" => parser.nextToken(); sz = parser.getIntValue
                case "card" =>
                  parser.nextToken(); card = parser.getLongValue
                case _ => parser.nextToken(); parser.skipChildren()
              }
              case _ => dvEnd = true
            }
            dv = Some(DvInfo(st, d, off, sz, card))
          case "cols" =>
            if (parser.nextToken() != JsonToken.START_OBJECT)
              throw new IllegalStateException("cols is not an object")
            var colsEnd = false
            while (!colsEnd) parser.nextToken() match {
              case JsonToken.FIELD_NAME =>
                val c = parser.currentName()
                cols += (c -> readColStats())
              case _ => colsEnd = true
            }
          case _ => parser.nextToken(); parser.skipChildren()
        }
        case _ => end = true
      }
      FileStat(rows, cols, bytes, mtime, dv, brid, rcv)
    }

    private def readColStats(): ColStats = {
      if (parser.nextToken() != JsonToken.START_OBJECT)
        throw new IllegalStateException("col stats is not an object")
      var mn: Option[Any] = None; var mx: Option[Any] = None
      var nulls: Option[Long] = None
      var end = false
      def value(): Any = parser.nextToken() match {
        case JsonToken.VALUE_NUMBER_INT => parser.getLongValue: Any
        case JsonToken.VALUE_NUMBER_FLOAT => parser.getDoubleValue: Any
        case _ => parser.getText: Any
      }
      while (!end) parser.nextToken() match {
        case JsonToken.FIELD_NAME => parser.currentName() match {
          case "min" => mn = Some(value())
          case "max" => mx = Some(value())
          case "nulls" => parser.nextToken(); nulls = Some(parser.getLongValue)
          case _ => parser.nextToken(); parser.skipChildren()
        }
        case _ => end = true
      }
      ColStats(mn, mx, nulls)
    }

    override def close(): Unit = parser.close()
  }

  def fromJson(body: String): Map[String, FileStat] = {
    val root = mapper.readTree(body)
    val files = root.get("files")
    if (files == null || !files.isObject) return Map.empty
    files.fields().asScala.map { e =>
      val fo = e.getValue
      val cols = Option(fo.get("cols")).filter(_.isObject)
        .map(_.fields().asScala.map { ce =>
          val co = ce.getValue
          def get(k: String): Option[Any] = Option(co.get(k)).map {
            case n: JsonNode if n.isIntegralNumber => n.asLong: Any
            case n: JsonNode if n.isFloatingPointNumber => n.asDouble: Any
            case n: JsonNode => n.asText: Any
          }
          ce.getKey -> ColStats(get("min"), get("max"),
            Option(co.get("nulls")).map(_.asLong))
        }.toMap).getOrElse(Map.empty[String, ColStats])
      val dv = Option(fo.get("dv")).filter(_.isObject).map(d =>
        DvInfo(d.get("st").asText, d.get("d").asText,
          d.get("off").asInt, d.get("sz").asInt, d.get("card").asLong))
      e.getKey -> FileStat(fo.get("rows").asLong, cols,
        Option(fo.get("bytes")).map(_.asLong),
        Option(fo.get("mtime")).map(_.asLong), dv,
        Option(fo.get("brid")).map(_.asLong),
        Option(fo.get("rcv")).map(_.asLong))
    }.toMap
  }

  // ---------------- predicate evaluation (skip decision) -------------

  /** True iff `stats` PROVE no row of the file can satisfy `pred`. */
  def canSkip(pred: Expression, stat: FileStat): Boolean = pred match {
    case And(l, r) => canSkip(l, stat) || canSkip(r, stat)
    case Or(l, r) => canSkip(l, stat) && canSkip(r, stat)
    case EqualTo(Attr(c), Lit(v)) => outOfRange(stat, c, v)
    case EqualTo(Lit(v), Attr(c)) => outOfRange(stat, c, v)
    case EqualNullSafe(Attr(c), Lit(v)) =>
      if (v == null) noNulls(stat, c) else outOfRange(stat, c, v)
    case GreaterThan(Attr(c), Lit(v)) => boundSkip(stat, c)(mx => le(mx, v))
    case GreaterThan(Lit(v), Attr(c)) => // v > col ⇔ col < v
      boundSkipMin(stat, c)(mn => ge(mn, v))
    case GreaterThanOrEqual(Attr(c), Lit(v)) =>
      boundSkip(stat, c)(mx => lt(mx, v))
    case GreaterThanOrEqual(Lit(v), Attr(c)) =>
      boundSkipMin(stat, c)(mn => gt(mn, v))
    case LessThan(Attr(c), Lit(v)) => boundSkipMin(stat, c)(mn => ge(mn, v))
    case LessThan(Lit(v), Attr(c)) => boundSkip(stat, c)(mx => le(mx, v))
    case LessThanOrEqual(Attr(c), Lit(v)) =>
      boundSkipMin(stat, c)(mn => gt(mn, v))
    case LessThanOrEqual(Lit(v), Attr(c)) =>
      boundSkip(stat, c)(mx => lt(mx, v))
    case In(Attr(c), vs) =>
      val lits = vs.map(Lit.unapply)
      lits.forall(_.isDefined) &&
        lits.flatten.forall(v => outOfRange(stat, c, v))
    // OptimizeIn rewrites any In past the conversion threshold
    // (default 10) into InSet, so every dynamically-built key filter
    // (dynamic file pruning collects up to 10^5 join keys) arrives
    // here. Per-expression the set is sorted ONCE (weak-memoized on
    // the hset instance); each file then pays one binary search for
    // "is any key inside my [min,max]" — O(log k) per file, not O(k).
    case i @ InSet(Attr(c), _) =>
      inSetSorted(i).exists(arr => noSetKeyInRange(arr, stat, c))
    case IsNull(Attr(c)) => noNulls(stat, c)
    case IsNotNull(Attr(c)) => allNulls(stat, c)
    case StartsWith(Attr(c), Lit(v: String)) => prefixSkip(stat, c, v)
    case _ => false
  }

  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute if u.nameParts.size == 1 =>
        Some(u.nameParts.head)
      case _ => None
    }
  }

  private def normLit(l: Literal): Any = l.value match {
    case null => null
    case b: java.lang.Byte => b.longValue
    case s: java.lang.Short => s.longValue
    case i: java.lang.Integer => i.longValue // ints, DateType days
    case j: java.lang.Long => j.longValue // longs, timestamp micros
    case f: java.lang.Float => f.doubleValue
    case d: java.lang.Double => d.doubleValue
    case u: UTF8String => u.toString
    case other => other
  }

  private object Lit {
    def unapply(e: Expression): Option[Any] = e match {
      case l: Literal => Some(normLit(l))
      case c if c.foldable && c.deterministic =>
        // the analyzer wraps literals in implicit Casts; fold them
        Some(normLit(Literal.create(c.eval(), c.dataType)))
      case _ => None
    }
  }

  /** Three-way compare across the normalized stat/literal domain; None
    * when the pairing is incomparable (→ never skip on it).
    */
  private[tables] def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    // BigDecimal(double) throws on NaN/Infinity; a parquet stat or a
    // literal can legally be non-finite -> incomparable, never skip.
    case (x: Long, y: Double) if java.lang.Double.isFinite(y) =>
      Some(BigDecimal(x).compare(BigDecimal(y)))
    case (x: Double, y: Long) if java.lang.Double.isFinite(x) =>
      Some(BigDecimal(x).compare(BigDecimal(y)))
    // +0.0 == -0.0 under SQL comparison semantics but Double.compare
    // ORDERS them (-0.0 < 0.0) — normalize signed zero (x + 0.0) so a
    // file holding +0.0 rows is never skipped for the literal -0.0.
    // NaN keeps Double.compare's greatest-value ordering, matching
    // Spark's NaN semantics.
    case (x: Double, y: Double) =>
      Some(java.lang.Double.compare(x + 0.0, y + 0.0))
    case (x: String, y: String) if isAscii(x) && isAscii(y) =>
      Some(Integer.signum(x.compareTo(y)))
    case _ => None
  }

  private def isAscii(s: String): Boolean = s.forall(_ < 0x80)

  private def lt(a: Any, b: Any) = cmp(a, b).exists(_ < 0)
  private def le(a: Any, b: Any) = cmp(a, b).exists(_ <= 0)
  private def gt(a: Any, b: Any) = cmp(a, b).exists(_ > 0)
  private def ge(a: Any, b: Any) = cmp(a, b).exists(_ >= 0)

  private def outOfRange(stat: FileStat, c: String, v: Any): Boolean =
    v != null && stat.cols.get(c).exists(cs =>
      cs.min.exists(mn => lt(v, mn)) || cs.max.exists(mx => gt(v, mx)))

  // -------- InSet skipping (dynamic file pruning's key-set filter) ----

  /** Sorted, normalized, null-free copy of an InSet's value set —
    * memoized per hset INSTANCE (weak keys: the cache dies with the
    * plan). None when any element normalizes outside the comparable
    * stat domain (mixed/unknown types → never skip). Null elements are
    * dropped: `x IN (…, NULL)` is never TRUE via the NULL, so a file
    * can be skipped on the non-null keys alone.
    */
  private val inSetCache =
    new java.util.WeakHashMap[AnyRef, Option[Array[Any]]]

  private def inSetSorted(i: InSet): Option[Array[Any]] =
    inSetCache.synchronized {
      val hit = inSetCache.get(i.hset)
      if (hit != null) return hit
      val norm = i.hset.iterator.map(normValue).filter(_ != null).toArray
      val comparable = norm.forall {
        case _: java.lang.Long | _: java.lang.Double => true
        case s: String => isAscii(s)
        case _ => false
      }
      // a homogeneous sortable domain is required for the binary
      // search; Long/Double mix still compares via cmp, but sorting
      // mixed arrays with a partial order is fragile — require one type
      val oneType = norm.map(_.getClass).distinct.length <= 1
      val res =
        if (!comparable || !oneType || norm.isEmpty) None
        else Some(norm.sortWith((a, b) => cmp(a, b).exists(_ < 0)))
      inSetCache.put(i.hset, res)
      res
    }

  /** True iff NO element of sorted `arr` falls inside the file's
    * [min,max] for column `c` — i.e. stats prove the set misses the
    * file. Missing stats keep the file (conservative).
    */
  private def noSetKeyInRange(arr: Array[Any], stat: FileStat,
                              c: String): Boolean =
    stat.cols.get(c).exists { cs =>
      (cs.min, cs.max) match {
        case (Some(mn), Some(mx)) =>
          // first element >= mn, via binary search over the total order
          var lo = 0; var hi = arr.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (lt(arr(mid), mn)) lo = mid + 1 else hi = mid
          }
          // skip iff no element >= mn, or the smallest such is > mx.
          // cmp=None (incomparable pairing) must KEEP the file.
          lo == arr.length ||
            cmp(arr(lo), mx).exists(_ > 0)
        case _ => false
      }
    }

  // -------- MERGE rewrite-scope helpers (ResourceTable upsert/delete) --

  /** Normalize a runtime value (from `Row.get`) into the stats compare
    * domain (Long/Double/String), mirroring parquet's stat encodings:
    * dates as epoch days, timestamps as epoch micros. Unknown types
    * stay as-is and fall out as incomparable (→ never skip).
    */
  private def normValue(v: Any): Any = v match {
    case b: java.lang.Byte => b.longValue
    case s: java.lang.Short => s.longValue
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
    case f: java.lang.Float => f.doubleValue
    case d: java.lang.Double => d.doubleValue
    case u: UTF8String => u.toString
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case t: java.time.Instant =>
      t.getEpochSecond * 1000000L + t.getNano / 1000
    case other => other
  }

  /** True iff stats PROVE no value of `keys` occurs in the file's
    * column `c` — every key sits outside the file's [min,max]. Missing
    * or poisoned stats, incomparable types, and null keys keep the file
    * (conservative).
    */
  def canSkipKeys(stat: FileStat, c: String, keys: Iterable[Any]): Boolean =
    keys.forall(k => outOfRange(stat, c, normValue(k)))

  /** True iff stats prove the file's `c` range and [lo, hi] are
    * disjoint. Null bounds (all-null batch keys) never skip.
    */
  def canSkipRange(stat: FileStat, c: String, lo: Any, hi: Any): Boolean = {
    val l = normValue(lo)
    val h = normValue(hi)
    l != null && h != null && stat.cols.get(c).exists(cs =>
      cs.min.exists(mn => lt(h, mn)) || cs.max.exists(mx => gt(l, mx)))
  }

  private def boundSkip(stat: FileStat, c: String)(f: Any => Boolean) =
    stat.cols.get(c).exists(_.max.exists(f))
  private def boundSkipMin(stat: FileStat, c: String)(f: Any => Boolean) =
    stat.cols.get(c).exists(_.min.exists(f))

  private def noNulls(stat: FileStat, c: String): Boolean =
    stat.cols.get(c).exists(_.numNulls.contains(0L))
  private def allNulls(stat: FileStat, c: String): Boolean =
    stat.cols.get(c).exists(_.numNulls.contains(stat.rows)) && stat.rows > 0

  /** startsWith(prefix): matching rows live in [prefix, nextPrefix).
    * Skip when the file's whole range is outside that interval.
    */
  private def prefixSkip(stat: FileStat, c: String, p: String): Boolean =
    stat.cols.get(c).exists { cs =>
      val below = cs.max.exists(mx => lt(mx, p))
      val above = nextPrefix(p).exists(np => cs.min.exists(mn => ge(mn, np)))
      below || above
    }

  private def nextPrefix(p: String): Option[String] = {
    if (!isAscii(p)) return None
    val chars = p.toCharArray
    var i = chars.length - 1
    while (i >= 0) {
      if (chars(i) < 0x7f) {
        chars(i) = (chars(i) + 1).toChar
        return Some(new String(chars, 0, i + 1))
      }
      i -= 1
    }
    None
  }
}
