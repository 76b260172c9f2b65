package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkTestBase {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "a b c d e f g h", "s0", 15L),
      (1L, "a a a b", "s0", 7L),
      (2L, "x y z w v u t q", "s0", 15L),
      (3L, "c d e f g h i j", "s1", 15L),
      (4L, "p p p p", "s1", 7L))
      .toDF("doc_id", "text", "source", "n_chars")
  }

  test("weightedSample returns exactly k rows with non-positive keys, deterministically") {
    val out = CorpusOps.weightedSample(docsDf, 3).collect()
    assert(out.length == 3)
    assert(out.forall(_.getDouble(2) <= 0.0), "ln(u)/w keys must be <= 0")
    val again = CorpusOps.weightedSample(docsDf, 3).collect()
    assert(out.sameElements(again), "hash-derived sampling must be deterministic")
    // sorted by doc_id on output
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }

  test("sequencePack partitions each shard's token stream by start offset") {
    // capacity 10; shard s0 docs (by doc_id): 8, 4, 8 tokens
    //   doc0 starts at 0  -> pack 0
    //   doc1 starts at 8  -> pack 0
    //   doc2 starts at 12 -> pack 1
    // shard s1: 8, 4 -> doc3 pack 0, doc4 starts at 8 -> pack 0
    val out = CorpusOps.sequencePack(docsDf, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("s0", 0L, 2L, 12L),
      ("s0", 1L, 1L, 8L),
      ("s1", 0L, 2L, 12L)))
    // token mass is conserved per shard
    val mass = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(mass == Map("s0" -> 20L, "s1" -> 12L))
  }

  test("decontaminate flags exactly the corpus docs sharing a 4-gram with eval") {
    // doc3 shares the 4-grams of "c d e f", "d e f g", "e f g h" with doc0;
    // docs 1, 2, 4 share nothing 4-token-long with doc0
    val corpus = docsDf.filter(col("doc_id") =!= 0L)
    val eval = docsDf.filter(col("doc_id") === 0L)
    val out = CorpusOps.decontaminate(corpus, eval, 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 3L, "three shared 4-gram shingles")
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 0L)
  }

  test("repetitionStats computes exact fractions and flags repetitive docs") {
    // explicit thresholds: the 0.12 default targets 30+-word fixture docs,
    // where 1/n_words sits below it; these 4-8 word docs need a wider gate
    val out = CorpusOps.repetitionStats(docsDf, topWordMax = 0.2, dupWordMax = 0.6)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc1 "a a a b": 4 words, 2 distinct, top word 3, bigrams: "a a" x2, "a b"
    val d1 = out(1L)
    assert(d1.getLong(1) == 4L)
    assert(d1.getDouble(2) == 0.5) // dup_word_frac = 1 - 2/4
    assert(d1.getDouble(3) == 0.75) // top_word_frac = 3/4
    assert(math.abs(d1.getDouble(4) - 0.666667) < 1e-9) // "a a" 2 of 3
    assert(d1.getInt(5) == 1)
    // doc0: all distinct -> unflagged
    val d0 = out(0L)
    assert(d0.getDouble(2) == 0.0 && d0.getInt(5) == 0)
    // doc4 "p p p p": fully repetitive
    assert(out(4L).getDouble(3) == 1.0 && out(4L).getInt(5) == 1)
  }

  test("invertedIndex aggregates postings with a sorted CSV head") {
    val out = CorpusOps.invertedIndex(docsDf, 5).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 2L) // df: docs 0 and 1
    assert(a.getLong(2) == 4L) // total tf: 1 + 3
    assert(a.getLong(3) == 0L && a.getLong(4) == 1L)
    assert(a.getString(5) == "0,1")
    val c = out("c")
    assert(c.getLong(1) == 2L && c.getString(5) == "0,3")
  }
}
