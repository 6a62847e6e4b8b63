package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import java.util.zip.CRC32

/** Delta deletion-vector decoding (PROTOCOL.md "Deletion Vectors"):
  * a DV names the dead row POSITIONS of one data file as a 64-bit
  * roaring bitmap ("RoaringBitmapArray" portable serialization), stored
  * inline in the log (z85 text), in a sidecar `deletion_vector_*.bin`
  * named by a z85 UUID, or at an absolute path. [[DeltaExport
  * .readSnapshot]] decodes descriptors ON EXECUTORS (one task per DV —
  * bytes and positions never gather on the driver) and anti-joins the
  * scan on `(_metadata.file_path, _metadata.row_index)`, Spark's native
  * per-file row position.
  *
  * Everything here follows public specifications only: the Delta
  * protocol's DV sections and the RoaringFormatSpec
  * (github.com/RoaringBitmap/RoaringFormatSpec) for the 32-bit portable
  * container layout. Reference behavior anchor: the reference's tables
  * are ordinary Delta tables its integration readers consume
  * (tests/integration/test_deployment_in_k8s.py:53–60); DV-bearing
  * tables are what delta-spark writes them as once DVs are enabled.
  */
object DeletionVectors {

  /** Descriptor of one add action's DV, as replayed from the log. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Int, sizeInBytes: Int,
                              cardinality: Long)

  /** 4-byte little-endian magic opening the RoaringBitmapArray
    * "portable" serialization (Delta PROTOCOL.md).
    */
  val PortableMagic = 1681511377

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** z85 inverse of [[z85Decode]]: 4 bytes → 5 chars. Input length
    * must be a multiple of 4 (DV blobs and UUIDs both are).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 length ${bytes.length} not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) {
        chunk(k) = Z85Alphabet((acc % 85).toInt); acc /= 85; k -= 1
      }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** z85 for an arbitrary-length blob: zero-pad to a 4-byte multiple
    * first (delta's inline-DV convention — the descriptor's
    * `sizeInBytes` keeps the REAL length, and decoders read only the
    * bytes the bitmap header promises, so the pad is inert).
    */
  def z85EncodePadded(blob: Array[Byte]): String = {
    val pad = (4 - blob.length % 4) % 4
    z85Encode(if (pad == 0) blob else blob ++ Array.fill(pad)(0.toByte))
  }

  /** ZeroMQ z85: 5 ASCII chars → 4 bytes, big-endian base-85. Delta
    * uses it for inline DVs and for the UUID in `u`-storage paths.
    */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = ByteBuffer.allocate(s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) Z85Decode(c.toInt) else -1
        require(v >= 0, s"invalid z85 character '$c'")
        acc = acc * 85 + v
        j += 1
      }
      // a 5-char group can encode past 2^32-1 with per-char-legal
      // digits; truncating to the low 32 bits would decode corrupt
      // inline-DV text (no CRC there) into a plausible-but-wrong
      // bitmap — reject per the z85 spec instead
      require(acc <= 0xFFFFFFFFL,
        s"z85 group overflows 32 bits at offset $i")
      out.putInt(acc.toInt)
      i += 5
    }
    out.array()
  }

  /** Resolve a descriptor to the absolute DV file path (`u`/`p`
    * storage) — `u` derives `deletion_vector_<uuid>.bin` under the
    * table root from the z85 UUID, honoring the optional random
    * prefix; `p` is already absolute.
    */
  def filePath(root: HPath, d: Descriptor): HPath = d.storageType match {
    case "p" => new HPath(d.pathOrInlineDv)
    case "u" =>
      val s = d.pathOrInlineDv
      require(s.length >= 20, s"u-storage path too short: $s")
      val prefix = s.dropRight(20)
      val bytes = z85Decode(s.takeRight(20))
      val bb = ByteBuffer.wrap(bytes)
      val uuid = new UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new HPath(root, name)
      else new HPath(new HPath(root, prefix), name)
    case other =>
      throw new IllegalArgumentException(s"no file path for storage '$other'")
  }

  /** The serialized bitmap bytes of one descriptor. Inline (`i`)
    * decodes from the log text; `u`/`p` read the framed on-disk form —
    * version byte 1 at file start, then at `offset`: big-endian size,
    * the bitmap bytes, and a big-endian CRC-32 which is verified.
    */
  def bitmapBytes(conf: Configuration, root: HPath,
                  d: Descriptor): Array[Byte] = d.storageType match {
    case "i" => z85Decode(d.pathOrInlineDv)
    case "u" | "p" =>
      val p = filePath(root, d)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        val version = in.readByte()
        if (version != 1) throw new IOException(
          s"$p: deletion vector file version $version; expected 1")
        in.seek(d.offset.toLong)
        val size = in.readInt() // big-endian per the protocol
        if (size != d.sizeInBytes) throw new IOException(
          s"$p: DV size $size at offset ${d.offset} does not match " +
            s"descriptor sizeInBytes ${d.sizeInBytes}")
        val data = new Array[Byte](size)
        in.readFully(data)
        val expected = in.readInt()
        val crc = new CRC32()
        crc.update(data)
        if (crc.getValue.toInt != expected) throw new IOException(
          s"$p: DV checksum mismatch at offset ${d.offset}")
        data
      } finally in.close()
    case other => throw new IllegalArgumentException(
      s"unsupported deletion vector storageType '$other'")
  }

  /** Encode sorted 64-bit row positions as a RoaringBitmapArray
    * portable blob — the exact inverse of [[decodePositions]] and the
    * WRITE half of DV support: LE magic + LE bitmap count, then one
    * 32-bit roaring bitmap per high word in RoaringFormatSpec portable
    * layout. Containers are array (card ≤ 4096) or bitmap — never
    * run: the spec lets writers choose, every reader must take both,
    * and delete positions rarely form long runs. The high-word list
    * is DENSE from 0 (bitmap i must hold high word i, matching the
    * decoder and delta's RoaringBitmapArray): positions are file ROW
    * indexes, so high words above 0 only occur past 4G rows in one
    * file — empty 32-bit bitmaps (cookie, size 0) fill any gaps.
    */
  def encodePositions(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    val nHi = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    require(nHi <= 64, s"absurd DV high-word count $nHi")
    // group low words per high word (dense, gaps -> empty arrays)
    val byHi = Array.fill(nHi.toInt)(Array.newBuilder[Int])
    sorted.foreach(p => byHi((p >>> 32).toInt) += p.toInt)
    val bitmaps = byHi.map(b => encodeRoaring32(b.result()))
    val out = ByteBuffer
      .allocate(4 + 8 + bitmaps.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(PortableMagic)
    out.putLong(nHi)
    bitmaps.foreach(out.put)
    out.array()
  }

  /** One 32-bit roaring bitmap, portable, no-run form: cookie 12346 +
    * container count, descriptive headers (key, card−1), the offset
    * table (byte position of each container from this bitmap's
    * cookie — required by the no-run cookie), then array/bitmap
    * container payloads in key order.
    */
  private def encodeRoaring32(values: Array[Int]): Array[Byte] = {
    // group by 16-bit key; values arrive sorted so keys are in order
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    values.foreach { v =>
      groups.getOrElseUpdate(v >>> 16,
        new scala.collection.mutable.ArrayBuffer[Int]) += (v & 0xFFFF)
    }
    val size = groups.size
    val payloads = groups.map { case (_, lows) =>
      if (lows.length <= 4096) {
        val b = ByteBuffer.allocate(2 * lows.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        lows.foreach(v => b.putShort(v.toShort))
        b.array()
      } else {
        val words = new Array[Long](1024)
        lows.foreach(v => words(v >>> 6) |= 1L << (v & 63))
        val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(b.putLong)
        b.array()
      }
    }.toArray
    val headerBytes = 4 + 4 + 4 * size + 4 * size
    val out = ByteBuffer
      .allocate(headerBytes + payloads.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(SerialCookieNoRun)
    out.putInt(size)
    groups.foreach { case (key, lows) =>
      out.putShort(key.toShort)
      out.putShort((lows.length - 1).toShort)
    }
    var off = headerBytes
    payloads.foreach { p => out.putInt(off); off += p.length }
    payloads.foreach(out.put)
    out.array()
  }

  /** Write one DV blob as a `u`-storage sidecar under `root`:
    * `deletion_vector_<uuid>.bin` framed per the protocol — version
    * byte 1, then at offset 1 a big-endian size, the blob, and a
    * big-endian CRC-32 (the exact frame [[bitmapBytes]] verifies).
    * Returns the descriptor.
    */
  def writeSidecar(conf: Configuration, root: HPath,
                   blob: Array[Byte], cardinality: Long): Descriptor = {
    val uuid = UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val p = new HPath(root, s"deletion_vector_$uuid.bin")
    val fs = p.getFileSystem(conf)
    val crc = new CRC32()
    crc.update(blob)
    val frame = ByteBuffer.allocate(1 + 4 + blob.length + 4)
    frame.put(1.toByte)
    frame.putInt(blob.length) // BE — ByteBuffer default
    frame.put(blob)
    frame.putInt(crc.getValue.toInt)
    val out = fs.create(p, false)
    try out.write(frame.array()) finally out.close()
    Descriptor("u", z85Encode(bb.array()), 1, blob.length, cardinality)
  }

  /** Decode a RoaringBitmapArray portable blob to sorted 64-bit row
    * positions: LE magic, LE bitmap count, then each 32-bit bitmap in
    * RoaringFormatSpec portable layout; bitmap i holds the low 32 bits
    * of positions whose high 32 bits are i.
    */
  def decodePositions(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"bad RoaringBitmapArray magic $magic (expected $PortableMagic)")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"absurd bitmap count $n")
    val out = Array.newBuilder[Long]
    var hi = 0L
    while (hi < n) {
      decodeRoaring32(bb, v => out += (hi << 32) | (v & 0xFFFFFFFFL))
      hi += 1
    }
    out.result()
  }

  private val SerialCookie = 12347
  private val SerialCookieNoRun = 12346
  private val NoOffsetThreshold = 4

  /** One 32-bit roaring bitmap in portable serialization
    * (RoaringFormatSpec): cookie (+run bitset), descriptive headers,
    * optional offset table, then array / bitmap / run containers in
    * key order. Values are emitted in ascending order.
    */
  private def decodeRoaring32(bb: ByteBuffer, emit: Long => Unit): Unit = {
    val cookie = bb.getInt
    val hasRun = (cookie & 0xFFFF) == SerialCookie
    val size =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require(cookie == SerialCookieNoRun,
          s"bad roaring cookie $cookie")
        bb.getInt
      }
    val runBitset =
      if (!hasRun) Array.emptyByteArray
      else {
        val b = new Array[Byte]((size + 7) / 8)
        bb.get(b)
        b
      }
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = bb.getShort & 0xFFFF
      cards(i) = (bb.getShort & 0xFFFF) + 1
      i += 1
    }
    if (!hasRun || size >= NoOffsetThreshold) {
      var j = 0
      while (j < size) { bb.getInt; j += 1 } // offsets — sequential read
    }
    i = 0
    while (i < size) {
      val base = keys(i).toLong << 16
      val isRun = hasRun && (runBitset(i / 8) & (1 << (i % 8))) != 0
      if (isRun) {
        val nRuns = bb.getShort & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xFFFF
          val len = bb.getShort & 0xFFFF
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { emit(base | (bb.getShort & 0xFFFF)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          val word = bb.getLong
          if (word != 0L) {
            var bit = 0
            while (bit < 64) {
              if ((word & (1L << bit)) != 0) emit(base | (w * 64 + bit))
              bit += 1
            }
          }
          w += 1
        }
      }
      i += 1
    }
  }
}

/** java-serializable Hadoop Configuration carrier, so executor tasks
  * can open DV sidecar files through the session's filesystem conf.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
