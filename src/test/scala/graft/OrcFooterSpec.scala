package graft

import java.nio.file.{Files, Paths}

import graft.operators.OrcFooter

/** ORC tail probe: the protobuf decode cross-checked against Spark's
  * own ORC writer under three codecs, plus the hostile sweep.
  */
class OrcFooterSpec extends SparkTestBase {

  private def writeOne(compression: String): Array[Byte] = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"orcfooter_$compression").toString
    (0 until 400).map(i => (i.toLong * 5 - 100, s"name_${i % 9}"))
      .toDF("k", "s")
      .coalesce(1).write.mode("overwrite")
      .option("compression", compression).orc(dir)
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".orc"))
      .get
    Files.readAllBytes(Paths.get(part.getPath))
  }

  test("round trip under NONE, SNAPPY, and ZLIB block framing") {
    for (codec <- Seq("none", "snappy", "zlib")) {
      val b = writeOne(codec)
      val f = OrcFooter.probe(b).get
      assert(f.compression == codec.toUpperCase, codec)
      assert(f.numRows == 400, codec)
      assert(f.nStripes == 1, codec)
      // type tree preorder: root STRUCT(12), k LONG(4), s STRING(7)
      assert(f.typeKinds == Vector(12, 4, 7), codec)
      assert(f.stats.length == 3, codec)
      val kStats = f.stats(1)
      assert(kStats.numValues == 400)
      assert(kStats.intMin.contains(-100L))
      assert(kStats.intMax.contains(399L * 5 - 100))
      // sint64 sum: Σ (5i - 100) = 5·(399·400/2) - 100·400
      assert(kStats.intSum.contains(5L * 399 * 400 / 2 - 100L * 400))
      val sStats = f.stats(2)
      assert(sStats.strMin.contains("name_0"))
      assert(sStats.strMax.contains("name_8"))
    }
  }

  test("stripe stream walk: streams tile the stripe, dictionary vs " +
    "direct encodings land as the data's cardinality dictates") {
    for (codec <- Seq("none", "snappy", "zlib")) {
      val b = writeOne(codec)
      val stripes = OrcFooter.probeStripes(b).get
      assert(stripes.length == 1, codec)
      val st = stripes.head
      assert(st.rows == 400)
      // encodings align with the type tree: root STRUCT, k LONG, s STRING;
      // s has 9 distinct values over 400 rows (ratio 0.0225 <= the 0.8
      // dictionary threshold) -> DICTIONARY_V2 with the exact ndv;
      // k is an int column -> DIRECT_V2, no dictionary
      assert(st.encodings.length == 3)
      assert(st.encodings(1).kind == 2 && st.encodings(1).dictionarySize == 0)
      assert(st.encodings(2).kind == 3 && st.encodings(2).dictionarySize == 9)
      // streams: the tiling invariants are enforced inside probeStripes
      // (index kinds sum to indexLength, the rest to dataLength); here pin
      // the per-column stream shapes — no PRESENT streams (no nulls), one
      // ROW_INDEX per column, DATA for k, DATA+LENGTH+DICTIONARY_DATA for s
      assert(!st.streams.exists(_.kind == 0), "no nulls -> no PRESENT")
      assert(st.streams.count(_.kind == 6) == 3, "one ROW_INDEX per column")
      def kinds(colId: Int) =
        st.streams.filter(s => s.column == colId && !s.isIndex)
          .map(_.kind).sorted
      assert(kinds(1) == Vector(1), codec) // k: DATA
      assert(kinds(2) == Vector(1, 2, 3), codec) // s: DATA, LENGTH, DICT
      assert(st.streams.filter(!_.isIndex).forall(_.length > 0))
    }
    // hostile bytes: stripe-footer region corruption rejects or walks,
    // never throws; truncation mid-stripe rejects
    val b = writeOne("zlib")
    assert(OrcFooter.probeStripes(b.dropRight(12)).isEmpty)
    (0 until b.length by 11).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x5c).toByte
      OrcFooter.probeStripes(c)
    }
  }

  test("negative int stats decode via zigzag (a plain-varint reader is wrong)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orcfooter_neg").toString
    Seq(-5L, -3L, 8L).toDF("x").coalesce(1).write.mode("overwrite")
      .option("compression", "none").orc(dir)
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.endsWith(".orc")).get
    val f = OrcFooter.probe(Files.readAllBytes(Paths.get(part.getPath))).get
    assert(f.stats(1).intMin.contains(-5L))
    assert(f.stats(1).intMax.contains(8L))
    assert(f.stats(1).intSum.contains(0L))
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val b = writeOne("snappy")
    assert(OrcFooter.probe(Array.emptyByteArray).isEmpty)
    assert(OrcFooter.probe(b.take(3)).isEmpty)
    def mut(f: Array[Byte] => Unit) = { val c = b.clone(); f(c); OrcFooter.probe(c) }
    assert(mut(_(0) = 'X'.toByte).isEmpty) // magic
    assert(mut(c => c(c.length - 1) = 0).isEmpty) // zero postscript length
    assert(mut(c => c(c.length - 1) = 0xff.toByte).isEmpty) // ps overrun
    // corrupt the tail region wholesale: clean Option every time
    ((b.length - 120).max(0) until b.length).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x33).toByte
      OrcFooter.probe(c) // never throws
    }
  }
}
