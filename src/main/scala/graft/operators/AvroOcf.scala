package graft.operators

import java.util.zip.{Deflater, Inflater}

import scala.util.control.NonFatal

/** AVRO OBJECT CONTAINER FILE walk + record decode (the public Avro
  * 1.x spec at avro.apache.org): the third self-describing lake format
  * beside parquet ([[ParquetFooter]]) and ORC — event streams and
  * Kafka archive dumps overwhelmingly land as `.avro` container
  * files. The walk is the real thing end to end: the `Obj\1` magic,
  * the avro-binary metadata MAP (block-counted key/value pairs) whose
  * `avro.schema` JSON is parsed (Jackson, already on the Spark
  * classpath) and whose `avro.codec` selects the block codec, the
  * 16-byte sync marker, then (count, size, payload, sync) data blocks
  * with every block's sync REQUIRED to equal the header's — and the
  * records themselves are decoded from avro binary (zigzag-varint
  * ints/longs, length-prefixed UTF-8 strings, single-byte booleans,
  * little-endian doubles) with each block's payload required to tile
  * exactly into its declared record count.
  *
  * Codecs, all decoded for real: `null` (identity), `deflate` (RAW
  * deflate, RFC 1951 — the JDK's `Inflater(true)`), and `snappy`
  * (snappy-java, shipped with Spark) whose avro block form carries a
  * 4-byte BIG-endian CRC32 of the UNCOMPRESSED data after the
  * compressed bytes — VERIFIED, so one flipped payload bit rejects.
  * The remaining optional codecs (bzip2/xz/zstandard) are explicit
  * declines (None, not a fabricated decode), the [[MpegFrames]]
  * posture.
  *
  * Schema scope: [[probe]] reads a top-level record of primitive
  * fields (`long`, `int`, `string`, `boolean`, `double`);
  * [[probeNested]] (round 11) widens that to nested records, arrays,
  * and the `["null", X]` optional union — the exact shapes Iceberg
  * writes its manifest-list and manifest files in
  * ([[IcebergManifests]]). General unions, maps, enums, fixed, bytes,
  * and logical types still reject rather than mis-decode.
  *
  * Hostile-byte posture: [[probe]] never throws — wrong magic, a
  * malformed metadata map, unparseable schema JSON, an out-of-scope
  * schema, an unknown codec, a sync-marker mismatch, a truncated
  * varint, a block payload that does not tile into its record count,
  * or a negative string length all yield None.
  */
object AvroOcf {

  sealed trait Cell
  final case class LongCell(v: Long) extends Cell
  final case class StrCell(v: String) extends Cell
  final case class BoolCell(v: Boolean) extends Cell
  final case class DoubleCell(v: Double) extends Cell
  // nested extension (round 11, for Iceberg manifests): records,
  // arrays, and the ["null", X] optional union
  final case class RecCell(cells: Vector[Cell]) extends Cell
  final case class ArrCell(items: Vector[Cell]) extends Cell
  case object NullCell extends Cell

  final case class AvroField(name: String, ftype: String)

  /** Recursive Avro schema tree — the NESTED scope ([[probeNested]]).
    * Primitives match the flat reader; `TRecord` nests, `TArray` is the
    * block-encoded list, `TOpt` is the 2-branch `["null", X]` union
    * (the only union shape in scope — general unions still decline).
    */
  sealed trait AvroType
  case object TLong extends AvroType
  case object TInt extends AvroType
  case object TString extends AvroType
  case object TBool extends AvroType
  case object TDouble extends AvroType
  final case class TRecord(name: String,
      fields: Vector[(String, AvroType)]) extends AvroType
  final case class TArray(item: AvroType) extends AvroType
  final case class TOpt(inner: AvroType) extends AvroType

  /** Parsed container: codec, record name, fields, block count,
    * decoded rows (in file order), and the total UNCOMPRESSED payload
    * bytes across blocks.
    */
  final case class AvroInfo(codec: String, recordName: String,
      fields: Vector[AvroField], nBlocks: Int, rows: Vector[Vector[Cell]],
      payloadBytes: Long) {
    def nRecords: Int = rows.length
  }

  private final class Malformed extends RuntimeException

  private final class Reader(b: Array[Byte], var p: Int) {
    def fail(): Nothing = throw new Malformed
    def u8(): Int = { if (p >= b.length) fail(); val v = b(p) & 0xff; p += 1; v }
    def varlong(): Long = {
      var v = 0L; var sh = 0
      while (true) {
        val c = u8()
        v |= (c & 0x7fL) << sh
        if ((c & 0x80) == 0) return (v >>> 1) ^ -(v & 1) // zigzag
        sh += 7
        if (sh > 63) fail()
      }
      0L // unreachable
    }
    def bytes(n: Long): Array[Byte] = {
      if (n < 0 || n > b.length - p) fail()
      val out = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
      p += n.toInt; out
    }
    def str(): String = new String(bytes(varlong()), "UTF-8")
  }

  private def parseSchema(json: String): Option[(String, Vector[AvroField])] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper
      val root = om.readTree(json)
      if (root == null || root.path("type").asText() != "record") return None
      val name = root.path("name").asText()
      if (name.isEmpty) return None
      val fs = root.path("fields")
      if (!fs.isArray || fs.size() == 0) return None
      val out = Vector.newBuilder[AvroField]
      (0 until fs.size()).foreach { i =>
        val f = fs.get(i)
        val fn = f.path("name").asText()
        val ft = f.path("type").asText()
        if (fn.isEmpty) return None
        if (!Set("long", "int", "string", "boolean", "double").contains(ft))
          return None // unions/nested/logical types: out of scope
        out += AvroField(fn, ft)
      }
      Some((name, out.result()))
    } catch { case NonFatal(_) => None }

  private def inflateRaw(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater(true) // avro deflate is headerless RFC 1951
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) throw new Malformed
        out.write(buf, 0, n)
        if (out.size() > (64 << 20)) throw new Malformed // bomb guard
      }
      out.toByteArray
    } finally inf.end()
  }

  /** Shared container walk: magic, metadata map, codec dispatch, sync
    * verification, per-block decode with exact tiling. `parse` turns the
    * `avro.schema` JSON into a schema value; `decodeRow` reads one record
    * (throwing [[Malformed]] via the reader on any drift).
    */
  private def walkContainer[A](b: Array[Byte], parse: String => Option[A],
      decodeRow: (A, Reader) => Vector[Cell])
      : Option[(String, A, Int, Vector[Vector[Cell]], Long)] =
    try {
      if (b.length < 4 + 1 + 16) return None
      if (b(0) != 'O' || b(1) != 'b' || b(2) != 'j' || b(3) != 1) return None
      val r = new Reader(b, 4)
      // file metadata: avro map — count-prefixed blocks, 0 terminates
      var meta = Map.empty[String, Array[Byte]]
      var n = r.varlong()
      while (n != 0) {
        val cnt = if (n < 0) { r.varlong(); -n } else n // negative: size follows
        (0L until cnt).foreach { _ =>
          val k = r.str()
          meta += ((k, r.bytes(r.varlong())))
        }
        n = r.varlong()
      }
      val codec = meta.get("avro.codec").map(new String(_, "UTF-8"))
        .getOrElse("null")
      if (codec != "null" && codec != "deflate" && codec != "snappy")
        return None // bzip2/xz/zstandard: explicit declines
      val schemaJson = meta.get("avro.schema").map(new String(_, "UTF-8"))
        .getOrElse(return None)
      val schema = parse(schemaJson).getOrElse(return None)
      val sync = r.bytes(16)
      val rows = Vector.newBuilder[Vector[Cell]]
      var nBlocks = 0
      var payloadBytes = 0L
      while (r.p < b.length) {
        val cnt = r.varlong()
        if (cnt <= 0) return None
        val size = r.varlong()
        val raw = r.bytes(size)
        val blockSync = r.bytes(16)
        if (!java.util.Arrays.equals(blockSync, sync)) return None
        val payload = codec match {
          case "deflate" => inflateRaw(raw)
          case "snappy" =>
            // block = snappy bytes + 4-byte BE CRC32 of the plain data
            if (raw.length < 4) return None
            val data = org.xerial.snappy.Snappy.uncompress(
              java.util.Arrays.copyOfRange(raw, 0, raw.length - 4))
            val crc = new java.util.zip.CRC32
            crc.update(data)
            val want = ((raw(raw.length - 4) & 0xffL) << 24) |
              ((raw(raw.length - 3) & 0xffL) << 16) |
              ((raw(raw.length - 2) & 0xffL) << 8) |
              (raw(raw.length - 1) & 0xffL)
            if (crc.getValue != want) return None
            data
          case _ => raw
        }
        payloadBytes += payload.length
        val pr = new Reader(payload, 0)
        (0L until cnt).foreach(_ => rows += decodeRow(schema, pr))
        if (pr.p != payload.length) return None // exact tiling per block
        nBlocks += 1
      }
      if (nBlocks == 0) return None
      Some((codec, schema, nBlocks, rows.result(), payloadBytes))
    } catch { case NonFatal(_) => None }

  /** Walk a whole container per the scaladoc rules (FLAT schema scope). */
  def probe(b: Array[Byte]): Option[AvroInfo] =
    walkContainer[(String, Vector[AvroField])](b, parseSchema,
      (s, pr) => s._2.map { f =>
        f.ftype match {
          case "long" | "int" => LongCell(pr.varlong())
          case "string" => StrCell(pr.str())
          case "boolean" =>
            val v = pr.u8()
            if (v > 1) pr.fail()
            BoolCell(v == 1)
          case _ => // double: 8 bytes little-endian
            var bits = 0L
            (0 until 8).foreach(i =>
              bits |= (pr.u8().toLong & 0xff) << (8 * i))
            DoubleCell(java.lang.Double.longBitsToDouble(bits))
        }
      }).map { case (codec, (recName, fields), nBlocks, rows, payloadBytes) =>
        AvroInfo(codec, recName, fields, nBlocks, rows, payloadBytes)
      }

  /** Parsed NESTED container ([[probeNested]] result). */
  final case class AvroInfoN(codec: String, root: TRecord, nBlocks: Int,
      rows: Vector[Vector[Cell]], payloadBytes: Long) {
    def nRecords: Int = rows.length
  }

  /** [[probe]] widened to the nested scope: records of records, arrays,
    * and `["null", X]` optional unions — the shapes Iceberg manifest
    * files are written in ([[IcebergManifests]]). Rows are the TOP-level
    * field cells; nesting lands as [[RecCell]]/[[ArrCell]]/[[NullCell]].
    * Same hostile-byte posture: any structural drift yields None.
    */
  def probeNested(b: Array[Byte]): Option[AvroInfoN] =
    walkContainer[TRecord](b, parseSchemaNested,
      (root, pr) => root.fields.map { case (_, t) => decodeCell(pr, t) })
      .map { case (codec, root, nBlocks, rows, payloadBytes) =>
        AvroInfoN(codec, root, nBlocks, rows, payloadBytes)
      }

  private def decodeCell(r: Reader, t: AvroType): Cell = t match {
    case TLong | TInt => LongCell(r.varlong())
    case TString => StrCell(r.str())
    case TBool =>
      val v = r.u8()
      if (v > 1) r.fail()
      BoolCell(v == 1)
    case TDouble =>
      var bits = 0L
      (0 until 8).foreach(i => bits |= (r.u8().toLong & 0xff) << (8 * i))
      DoubleCell(java.lang.Double.longBitsToDouble(bits))
    case TRecord(_, fs) => RecCell(fs.map { case (_, ft) => decodeCell(r, ft) })
    case TOpt(inner) => r.varlong() match {
      case 0 => NullCell // branch order is pinned to ["null", X]
      case 1 => decodeCell(r, inner)
      case _ => r.fail()
    }
    case TArray(item) =>
      // block-encoded like the metadata map: count (negative = byte size
      // follows), items, 0 terminates
      val out = Vector.newBuilder[Cell]
      var total = 0L
      var n = r.varlong()
      while (n != 0) {
        val cnt = if (n < 0) { r.varlong(); -n } else n
        total += cnt
        if (total > (1L << 20)) r.fail() // hostile-count bomb guard
        (0L until cnt).foreach(_ => out += decodeCell(r, item))
        n = r.varlong()
      }
      ArrCell(out.result())
  }

  private def parseTypeNode(node: com.fasterxml.jackson.databind.JsonNode,
      depth: Int): Option[AvroType] = {
    if (node == null || depth > 16) return None
    if (node.isTextual) node.asText() match {
      case "long" => Some(TLong)
      case "int" => Some(TInt)
      case "string" => Some(TString)
      case "boolean" => Some(TBool)
      case "double" => Some(TDouble)
      case _ => None
    }
    else if (node.isArray) { // union: only ["null", X] is in scope
      if (node.size() != 2 || !node.get(0).isTextual ||
        node.get(0).asText() != "null") None
      else parseTypeNode(node.get(1), depth + 1).map(TOpt.apply)
    }
    else if (node.isObject) node.path("type").asText() match {
      case "record" =>
        val name = node.path("name").asText()
        if (name.isEmpty) return None
        val fs = node.path("fields")
        // an EMPTY fields list is legal Avro (a record may have zero
        // fields — e.g. an Iceberg unpartitioned partition tuple, spec
        // v1 "partition" under the void spec); its rows decode as zero
        // bytes, bounded by the block's own row count
        if (!fs.isArray) return None
        val out = Vector.newBuilder[(String, AvroType)]
        (0 until fs.size()).foreach { i =>
          val f = fs.get(i)
          val fn = f.path("name").asText()
          if (fn.isEmpty) return None
          out += ((fn, parseTypeNode(f.get("type"), depth + 1)
            .getOrElse(return None)))
        }
        Some(TRecord(name, out.result()))
      case "array" => parseTypeNode(node.get("items"), depth + 1)
        .map(TArray.apply)
      case _ => None // maps/fixed/enums/bytes: out of scope, decline
    }
    else None
  }

  private def parseSchemaNested(json: String): Option[TRecord] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper
      parseTypeNode(om.readTree(json), 0) match {
        case Some(r: TRecord) => Some(r)
        case _ => None
      }
    } catch { case NonFatal(_) => None }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format, real deflate.
  // ------------------------------------------------------------------

  private def zigzag(out: java.io.ByteArrayOutputStream, x: Long): Unit = {
    var v = (x << 1) ^ (x >> 63)
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def encodeRow(out: java.io.ByteArrayOutputStream,
      fields: Seq[AvroField], row: Seq[Cell]): Unit = {
    require(fields.length == row.length, "row arity mismatch")
    fields.zip(row).foreach {
      case (AvroField(_, "long" | "int"), LongCell(v)) => zigzag(out, v)
      case (AvroField(_, "string"), StrCell(v)) =>
        val bs = v.getBytes("UTF-8")
        zigzag(out, bs.length.toLong); out.write(bs, 0, bs.length)
      case (AvroField(_, "boolean"), BoolCell(v)) => out.write(if (v) 1 else 0)
      case (AvroField(_, "double"), DoubleCell(v)) =>
        val bits = java.lang.Double.doubleToLongBits(v)
        (0 until 8).foreach(i => out.write(((bits >> (8 * i)) & 0xff).toInt))
      case (f, c) => sys.error(s"cell $c does not fit field $f")
    }
  }

  private def typeJson(t: AvroType): String = t match {
    case TLong => "\"long\""
    case TInt => "\"int\""
    case TString => "\"string\""
    case TBool => "\"boolean\""
    case TDouble => "\"double\""
    case TRecord(name, fs) =>
      "{\"type\":\"record\",\"name\":\"" + name + "\",\"fields\":[" +
        fs.map { case (fn, ft) =>
          "{\"name\":\"" + fn + "\",\"type\":" + typeJson(ft) + "}"
        }.mkString(",") + "]}"
    case TArray(item) => "{\"type\":\"array\",\"items\":" + typeJson(item) + "}"
    case TOpt(inner) => "[\"null\"," + typeJson(inner) + "]"
  }

  private def encodeCellN(out: java.io.ByteArrayOutputStream,
      t: AvroType, c: Cell): Unit = (t, c) match {
    case (TLong | TInt, LongCell(v)) => zigzag(out, v)
    case (TString, StrCell(v)) =>
      val bs = v.getBytes("UTF-8")
      zigzag(out, bs.length.toLong); out.write(bs, 0, bs.length)
    case (TBool, BoolCell(v)) => out.write(if (v) 1 else 0)
    case (TDouble, DoubleCell(v)) =>
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => out.write(((bits >> (8 * i)) & 0xff).toInt))
    case (TRecord(_, fs), RecCell(cs)) =>
      require(fs.length == cs.length, "record arity mismatch")
      fs.zip(cs).foreach { case ((_, ft), cc) => encodeCellN(out, ft, cc) }
    case (TOpt(_), NullCell) => zigzag(out, 0L)
    case (TOpt(inner), cc) => zigzag(out, 1L); encodeCellN(out, inner, cc)
    case (TArray(item), ArrCell(items)) =>
      if (items.nonEmpty) {
        zigzag(out, items.length.toLong)
        items.foreach(encodeCellN(out, item, _))
      }
      zigzag(out, 0L)
    case (tt, cc) => sys.error(s"cell $cc does not fit type $tt")
  }

  /** [[synth]] for the NESTED scope: real recursive schema JSON, rows are
    * top-level field cells of `root`. Same real wire format and codecs.
    */
  def synthNested(root: TRecord, rows: Seq[Seq[Cell]], blockSizes: Seq[Int],
      codec: String, syncSeed: Int): Array[Byte] =
    writeContainer(typeJson(root), rows, blockSizes, codec, syncSeed,
      (out, row) => {
        require(root.fields.length == row.length, "row arity mismatch")
        root.fields.zip(row).foreach { case ((_, ft), c) =>
          encodeCellN(out, ft, c)
        }
      })

  /** Synthesize a VALID container: real schema JSON in the metadata
    * map, the given rows split into `blockSizes`-record blocks, the
    * codec applied for real (deflate = JDK raw Deflater). Real wire
    * format — [[probe]] is not told anything the bytes don't say.
    */
  def synth(recordName: String, fields: Seq[AvroField],
      rows: Seq[Seq[Cell]], blockSizes: Seq[Int], codec: String,
      syncSeed: Int): Array[Byte] = {
    val schema = "{\"type\":\"record\",\"name\":\"" + recordName +
      "\",\"fields\":[" + fields.map(f =>
        "{\"name\":\"" + f.name + "\",\"type\":\"" + f.ftype + "\"}")
        .mkString(",") + "]}"
    writeContainer(schema, rows, blockSizes, codec, syncSeed,
      (out, row) => encodeRow(out, fields, row))
  }

  private def writeContainer(schema: String, rows: Seq[Seq[Cell]],
      blockSizes: Seq[Int], codec: String, syncSeed: Int,
      encode: (java.io.ByteArrayOutputStream, Seq[Cell]) => Unit)
      : Array[Byte] = {
    require(blockSizes.sum == rows.length, "blocks must tile the rows")
    require(blockSizes.forall(_ > 0), "empty blocks are not written")
    require(codec == "null" || codec == "deflate" || codec == "snappy",
      s"codec $codec")
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    zigzag(out, 2L) // metadata map: one block of two entries
    def kv(k: String, v: String): Unit = {
      val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
      zigzag(out, kb.length.toLong); out.write(kb, 0, kb.length)
      zigzag(out, vb.length.toLong); out.write(vb, 0, vb.length)
    }
    kv("avro.codec", codec)
    kv("avro.schema", schema)
    zigzag(out, 0L) // map terminator
    val sync = Array.tabulate[Byte](16)(i => ((i * 37 + syncSeed) & 0xff).toByte)
    out.write(sync, 0, 16)
    var at = 0
    blockSizes.foreach { bs =>
      val body = new java.io.ByteArrayOutputStream()
      rows.slice(at, at + bs).foreach(r => encode(body, r))
      at += bs
      val raw = body.toByteArray
      val packed = codec match {
        case "deflate" =>
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(raw); d.finish()
            val o = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            while (!d.finished()) o.write(buf, 0, d.deflate(buf))
            o.toByteArray
          } finally d.end()
        case "snappy" =>
          val comp = org.xerial.snappy.Snappy.compress(raw)
          val crc = new java.util.zip.CRC32
          crc.update(raw)
          val v = crc.getValue
          comp ++ Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        case _ => raw
      }
      zigzag(out, bs.toLong)
      zigzag(out, packed.length.toLong)
      out.write(packed, 0, packed.length)
      out.write(sync, 0, 16)
    }
    out.toByteArray
  }
}
