package graft.operators

import scala.util.control.NonFatal

/** Generic PROTOBUF-lite reader (the public protobuf wire format):
  * varint / 64-bit / length-delimited / 32-bit wire types, REPEATED
  * fields kept in arrival order, nested messages parsed on demand,
  * sint zigzag decode. Schema-free — each format mapper picks its
  * spec-numbered fields ([[OrcFooter]] for orc_proto, [[TfRecord]]
  * for tf.Example). Never throws: [[ProtoLite.parse]] yields None on
  * any malformation.
  */
object ProtoLite {

  sealed trait PVal
  final case class PVarint(v: Long) extends PVal
  final case class PFixed64(v: Long) extends PVal
  final case class PFixed32(v: Int) extends PVal
  final case class PBytes(b: Array[Byte]) extends PVal

  final case class PMsg(fields: Map[Int, Vector[PVal]]) {
    def varint(id: Int): Option[Long] =
      fields.get(id).flatMap(_.headOption).collect { case PVarint(v) => v }
    def varints(id: Int): Vector[Long] =
      fields.getOrElse(id, Vector.empty).collect { case PVarint(v) => v }
    def bytes(id: Int): Option[Array[Byte]] =
      fields.get(id).flatMap(_.headOption).collect { case PBytes(b) => b }
    def str(id: Int): Option[String] = bytes(id).map(new String(_, "UTF-8"))
    def msg(id: Int): Option[PMsg] = bytes(id).flatMap(b => parse(b))
    def msgs(id: Int): Vector[PMsg] =
      fields.getOrElse(id, Vector.empty).collect { case PBytes(b) => b }
        .map(b => parse(b).getOrElse(
          // fail loudly: a malformed nested message must reject the whole
          // probe (the callers' NonFatal catch turns this into None), not
          // silently shrink a repeated field
          throw new RuntimeException("malformed nested message")))
  }

  /** sint64 decode: protobuf zigzag over a raw varint. */
  def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Parse one protobuf message from a byte slice. None on any
    * malformation; repeated fields keep arrival order.
    */
  def parse(b: Array[Byte], from: Int = 0, to: Int = -1): Option[PMsg] =
    try {
      val end = if (to < 0) b.length else to
      var p = from
      def u8(): Int = {
        if (p >= end) throw new RuntimeException("eof")
        val v = b(p) & 0xff; p += 1; v
      }
      def varint(): Long = {
        var v = 0L; var sh = 0
        while (true) {
          val c = u8()
          v |= (c & 0x7fL) << sh
          if ((c & 0x80) == 0) return v
          sh += 7
          if (sh > 63) throw new RuntimeException("varint")
        }
        0L
      }
      val fields = scala.collection.mutable.LinkedHashMap.empty[Int, Vector[PVal]]
      while (p < end) {
        val tag = varint()
        val id = (tag >>> 3).toInt
        if (id <= 0) return None
        val v: PVal = (tag & 7) match {
          case 0 => PVarint(varint())
          case 1 =>
            var x = 0L
            (0 until 8).foreach(i => x |= u8().toLong << (8 * i))
            PFixed64(x)
          case 2 =>
            val n = varint()
            if (n < 0 || n > end - p) return None
            val out = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
            p += n.toInt
            PBytes(out)
          case 5 =>
            var x = 0
            (0 until 4).foreach(i => x |= u8() << (8 * i))
            PFixed32(x)
          case _ => return None // groups / reserved wire types
        }
        fields(id) = fields.getOrElse(id, Vector.empty) :+ v
      }
      Some(PMsg(fields.toMap))
    } catch { case NonFatal(_) => None }

}
