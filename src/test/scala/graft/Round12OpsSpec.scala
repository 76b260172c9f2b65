package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, DeltaReplay, Similarity}

/** Edge cases for the round-12 operators: sliding-chunk boundaries,
  * vacuum resurrection/horizon rules, and contrastive-mining one-sided
  * anchors (the oracle gates cover the bulk semantics).
  */
class Round12OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("slidingChunks: boundary docs chunk correctly; empty docs drop") {
    val docs = Seq(
      (1L, ""),                        // split -> [""]: 1 token, 1 chunk
      (2L, (1 to 24).map("w" + _).mkString(" ")),  // exactly one stride
      (3L, (1 to 25).map("w" + _).mkString(" ")),  // one past the stride
      (4L, (1 to 32).map("w" + _).mkString(" "))   // exactly one window
    ).toDF("doc_id", "text")
    val out = CorpusOps.slidingChunks(docs, width = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_word", "chunk_len", "first_word")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, 1L, ""),
      (2L, 0L, 1L, 24L, "w1"),
      (3L, 0L, 1L, 25L, "w1"), (3L, 1L, 25L, 1L, "w25"),
      (4L, 0L, 1L, 32L, "w1"), (4L, 1L, 25L, 8L, "w25")))
  }

  test("slidingChunks is a stateless streaming transform: stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, (1 to 40).map("a" + _).mkString(" ")),
      (2L, (1 to 10).map("b" + _).mkString(" ")))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = CorpusOps.slidingChunks(
        mem.toDS().toDF("doc_id", "text"), width = 32, stride = 24)
      .writeStream.format("memory").queryName("chunks_stream_test")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("chunks_stream_test")
        .orderBy("doc_id", "chunk_id").collect().toSeq
      val batch = CorpusOps.slidingChunks(
          docs.toDF("doc_id", "text"), width = 32, stride = 24)
        .orderBy("doc_id", "chunk_id").collect().toSeq
      assert(streamed == batch && batch.size == 3)
    } finally q.stop()
  }

  test("vacuumCandidates: resurrection protects; horizon splits; asOf bounds") {
    val log = Seq(
      // a: removed young tombstone (not yet past horizon)
      (1L, """{"add":{"path":"a","size":10,"dataChange":true}}"""),
      (5L, """{"remove":{"path":"a","deletionTimestamp":900}}"""),
      // b: removed old tombstone (eligible)
      (1L, """{"add":{"path":"b","size":20,"dataChange":true}}"""),
      (4L, """{"remove":{"path":"b","deletionTimestamp":100}}"""),
      // c: removed then RE-ADDED -> live, never a candidate
      (1L, """{"add":{"path":"c","size":30,"dataChange":true}}"""),
      (4L, """{"remove":{"path":"c","deletionTimestamp":50}}"""),
      (6L, """{"add":{"path":"c","size":31,"dataChange":true}}"""),
      // d: removed AFTER asOf -> still live at asOf
      (1L, """{"add":{"path":"d","size":40,"dataChange":true}}"""),
      (9L, """{"remove":{"path":"d","deletionTimestamp":10}}""")
    ).toDF("version", "line")
    val out = DeltaReplay.vacuumCandidates(log, asOf = 7L, horizonTs = 500L)
      .orderBy("path")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 5L, 900L, 10L, false),
      ("b", 4L, 100L, 20L, true)))
  }

  test("contrastiveMining drops anchors lacking a positive or a negative") {
    def vec(x: Double) = (1 to 64).map(i => if (i == 1) x.toFloat else 0f)
    // label 0: three near-identical vectors (all pairs cos=1: no negative)
    // label 1: two orthogonal-ish vectors (cos=0: no positive)
    val emb = Seq(
      (1L, vec(1.0), 0), (2L, vec(2.0), 0), (3L, vec(3.0), 0),
      (10L, (1 to 64).map(i => if (i == 1) 1f else 0f), 1),
      (11L, (1 to 64).map(i => if (i == 2) 1f else 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    assert(Similarity.contrastiveMining(emb, 0.5).count() == 0)
    // add a mid-similarity vector (cos ~0.707) to label 0: at threshold
    // 0.9 anchors 1-3 gain a hard negative, while 4 itself has no
    // positive (all its cosines are 0.707 < 0.9) and stays dropped
    val emb2 = emb.unionByName(Seq(
      (4L, (1 to 64).map(i => if (i <= 2) 1f else 0f), 0))
      .toDF("vec_id", "embedding", "label"))
    val rows = Similarity.contrastiveMining(emb2, 0.9)
      .orderBy("anchor").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { r =>
      assert(r.getAs[Long]("neg_id") == 4L)
      assert(r.getAs[Double]("pos_cos") == 1.0)
      assert(math.abs(r.getAs[Double]("neg_cos") - 0.707107) < 1e-6)
    }
  }
}
