package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.roaringbitmap.RoaringBitmap

/** DELETION-VECTOR codec for the public Delta protocol (the PROTOCOL.md
  * "Deletion Vectors" section): the serialized form is a 64-bit
  * RoaringBitmap of deleted row positions —
  *
  *   - bitmap bytes = "portable" RoaringBitmapArray: a little-endian
  *     magic (1681511377), a little-endian i64 bitmap count, then per
  *     bitmap its little-endian i32 high-32-bit key followed by a
  *     standard portable-format 32-bit RoaringBitmap of the low bits;
  *   - on-disk DV files open with a single format-version byte (1);
  *     each vector sits at its descriptor's `offset` as
  *     `<i32 BE size> <bitmap bytes> <i32 BE CRC-32 of the bytes>`;
  *   - the `add.deletionVector` descriptor addresses the bytes three
  *     ways: `u` (relative file named `deletion_vector_<uuid>.bin`,
  *     uuid carried as the trailing 20 chars of Z85 text, any leading
  *     chars an opaque path prefix), `p` (absolute file path), and
  *     `i` (the bitmap bytes themselves, Z85-inline).
  *
  * Z85 is the ZeroMQ base-85 alphabet (4 bytes → 5 chars, big-endian
  * group value, most-significant digit first).
  *
  * Scale: a DV is O(deleted rows in one file) and bounded by design
  * (OPTIMIZE folds them); decode is driver-side and cheap next to the
  * scan it prunes. The bitmap containers come from the RoaringBitmap
  * library Spark itself ships.
  */
object DeltaDv {

  /** add.deletionVector, the protocol's descriptor fields. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Int, cardinality: Long)

  // ------------------------------------------------------------- Z85

  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"

  private val Z85Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85 over `raw` padded with zero bytes to a 4-byte boundary — the
    * protocol codec's shape (the descriptor's `sizeInBytes` carries the
    * true length; [[z85DecodeN]] truncates back to it). */
  def z85Encode(raw: Array[Byte]): String = {
    val bytes =
      if (raw.length % 4 == 0) raw
      else java.util.Arrays.copyOf(raw, (raw.length / 4 + 1) * 4)
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val digits = new Array[Char](5)
      var k = 4
      while (k >= 0) { digits(k) = Z85Chars.charAt((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(digits)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 decodes 5-char groups; got ${s.length} chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Index(c) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >>> 24) & 0xff).toByte
      out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5
      o += 4
    }
    out
  }

  /** Decode and truncate to the descriptor-declared byte length
    * (drops the zero padding [[z85Encode]] added). */
  def z85DecodeN(s: String, n: Int): Array[Byte] = {
    val full = z85Decode(s)
    require(full.length >= n && full.length - n < 4,
      s"z85 text decodes to ${full.length} bytes; expected $n (+<4 padding)")
    java.util.Arrays.copyOf(full, n)
  }

  // --------------------------------------- portable RoaringBitmapArray

  private val PortableMagic = 1681511377

  /** Portable RoaringBitmapArray bytes → sorted 64-bit positions. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == PortableMagic,
      s"bad RoaringBitmapArray magic $magic (want $PortableMagic)")
    val n = buf.getLong
    val out = Array.newBuilder[Long]
    var i = 0L
    while (i < n) {
      val key = buf.getInt
      val bm = new RoaringBitmap()
      bm.deserialize(buf)
      buf.position(buf.position() + bm.serializedSizeInBytes())
      bm.forEach((v: Int) => {
        out += (key.toLong << 32) | (v & 0xffffffffL); ()
      })
      i += 1
    }
    out.result().sorted
  }

  /** Sorted/unsorted 64-bit positions → portable RoaringBitmapArray
    * bytes (the write half — fixtures, tests, and the MoR machinery's
    * own persistence can all speak the public format). */
  def serialize(positions: Seq[Long]): Array[Byte] = {
    val byKey = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byKey.map { case (key, ps) =>
      val bm = new RoaringBitmap()
      ps.foreach(p => bm.add((p & 0xffffffffL).toInt))
      bm.runOptimize()
      (key, bm)
    }
    val size = 4 + 8 + bitmaps.map(4 + _._2.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(PortableMagic)
    buf.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (key, bm) =>
      buf.putInt(key)
      bm.serialize(buf)
    }
    buf.array()
  }

  // ------------------------------------------------------ file layout

  private def readAll(spark: SparkSession, p: Path): Array[Byte] = {
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      out.toByteArray
    } finally in.close()
  }

  private def uuidFromZ85(encoded: String): String = {
    val b = z85Decode(encoded)
    require(b.length == 16, s"DV uuid must decode to 16 bytes, got ${b.length}")
    val buf = ByteBuffer.wrap(b)
    new java.util.UUID(buf.getLong, buf.getLong).toString
  }

  /** The on-disk file a descriptor's vector lives in — `None` for the
    * inline storage type. The maintenance sweep ([[graft.sources
    * .DeltaMaintenance.vacuum]]) uses this to tell a referenced DV
    * sidecar from a superseded one. */
  private[sources] def filePathOf(tablePath: String, d: Descriptor): Option[Path] =
    d.storageType match {
      case "i" => None
      case "p" => Some(new Path(d.pathOrInlineDv))
      case "u" =>
        require(d.pathOrInlineDv.length >= 20,
          s"uuid DV pathOrInlineDv too short: '${d.pathOrInlineDv}'")
        val prefix = d.pathOrInlineDv.dropRight(20)
        val uuid = uuidFromZ85(d.pathOrInlineDv.takeRight(20))
        val rel = (if (prefix.isEmpty) "" else s"$prefix/") +
          s"deletion_vector_$uuid.bin"
        Some(new Path(s"$tablePath/$rel"))
      case other => throw new UnsupportedOperationException(
        s"delta DV storageType '$other' is outside the protocol (u/i/p)")
    }

  /** Resolve a descriptor to its deleted row positions, verifying the
    * stored size and CRC-32 for the on-file storage types. */
  def positions(spark: SparkSession, tablePath: String, d: Descriptor): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        z85DecodeN(d.pathOrInlineDv, d.sizeInBytes)
      case "u" | "p" =>
        val p = filePathOf(tablePath, d).get
        val bytes = readAll(spark, p)
        val off = d.offset.getOrElse(throw new IllegalStateException(
          s"on-file DV descriptor for $p carries no offset")).toInt
        val buf = ByteBuffer.wrap(bytes) // size/CRC framing is big-endian
        buf.position(off)
        val size = buf.getInt
        require(size == d.sizeInBytes,
          s"DV at $p offset $off frames $size bytes, descriptor says ${d.sizeInBytes}")
        val body = new Array[Byte](size)
        buf.get(body)
        val storedCrc = buf.getInt
        val crc = new CRC32(); crc.update(body)
        require(storedCrc == crc.getValue.toInt,
          s"DV at $p offset $off fails its CRC-32 check (corrupt file)")
        body
      case other => throw new UnsupportedOperationException(
        s"delta DV storageType '$other' is outside the protocol (u/i/p)")
    }
    val ps = deserialize(data)
    require(ps.length == d.cardinality,
      s"DV decodes ${ps.length} positions, descriptor says ${d.cardinality}")
    ps
  }

  /** Write `positions` as an on-disk DV file under `tablePath` in the
    * protocol layout (version byte, BE size/CRC framing) and return the
    * matching `u`-storage descriptor. `uuid` is caller-supplied so
    * fixtures stay deterministic. */
  def writeDvFile(spark: SparkSession, tablePath: String,
      uuid: java.util.UUID, positions: Seq[Long]): Descriptor = {
    val data = serialize(positions)
    val crc = new CRC32(); crc.update(data)
    val buf = ByteBuffer.allocate(1 + 4 + data.length + 4)
    buf.put(1.toByte) // file format version
    buf.putInt(data.length)
    buf.put(data)
    buf.putInt(crc.getValue.toInt)
    val p = new Path(s"$tablePath/deletion_vector_$uuid.bin")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(buf.array()) finally out.close()
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    Descriptor("u", z85Encode(uuidBytes), Some(1L), data.length, positions.size.toLong)
  }
}
