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
