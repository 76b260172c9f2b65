package graft

import graft.operators.{Multimodal, Similarity, TextAnalysis}

class TextAndSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")

  test("html boilerplate strip drops blocks wholesale, keeps content, collapses space") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script body containing '<' must not break the block match
      ("<html><head><script>if(a<b)x()</script><title>T</title></head>" +
        "<body><p>hello   world</p><footer>f</footer></body></html>", "T hello world"),
      ("<div>plain <b>bold</b> text</div>", "plain bold text"),
      ("no tags at all", "no tags at all"),
      ("<nav>m1 <a href=x>m2</a></nav><p>real</p><aside>ad</aside>", "real"),
      ("<style>p{}</style><header>h</header>only", "only"),
      // tag names are case-insensitive in HTML: blocks must strip anyway
      ("<SCRIPT src=x>dead()</SCRIPT><p>kept</p>", "kept"),
      ("<Style>p{}</STYLE ><NAV>m</nav>yes", "yes"),
      // an unrelated tag SHARING the prefix is not a script block: its
      // body survives (the tags themselves strip as generic tags)
      ("<scripty>not a script</scripty> ok", "not a script ok"))
    val got = cases.toDF("html", "want")
      .select(TextAnalysis.stripHtmlBoilerplate(col("html")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"'${r.getString(0)}' != '${r.getString(1)}'"))
  }

  test("url canonicalization folds case/port/www/utm/fragment/slash") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&q=1#top",
        "https://example.com/a/b?q=1"),
      // three adjacent utm params: two healing passes + the trailing strip
      ("http://www2.Site.org:80/p?utm_a=1&utm_b=2&utm_c=3", "http://site.org/p"),
      ("https://host.net/x/", "https://host.net/x"),
      ("https://host.net/?utm_only=1", "https://host.net"),
      ("https://host.net/a?x=1&utm_m=2&y=3", "https://host.net/a?x=1&y=3"),
      // ports that are NOT default survive; non-utm params never touched
      ("https://Host.net:8443/a?utm=notreally&z=2", "https://host.net:8443/a?utm=notreally&z=2"),
      // PATH-LESS urls: host extraction stops at ? and #, so the query
      // still gets utm-stripped and the fragment still drops
      ("https://Example.com?utm_source=x", "https://example.com"),
      ("HTTP://EXAMPLE.COM#frag", "http://example.com"),
      ("https://www.Example.com:443?a=1#f", "https://example.com?a=1"))
    val got = cases.toDF("url", "want")
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"'${r.getString(0)}' != '${r.getString(1)}'"))
  }

  test("luhnScrub validates candidates with the real checksum and redacts only valid ones") {
    import org.apache.spark.sql.functions.col
    // independent Luhn reference, coded plainly from the public algorithm
    def luhnValid(s: String): Boolean = {
      val sum = s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum
      sum % 10 == 0
    }
    def mint(seed: Int): String = {
      val body = (0 until 15).map(i => (seed * (i + 3) + i * 7) % 10)
      // brute-force the check digit against the reference
      (0 to 9).map(c => body.mkString + c).find(luhnValid).get
    }
    val valid1 = mint(7); val valid2 = mint(123)
    val invalid = valid1.dropRight(1) + ((valid1.last - '0' + 1) % 10)
    val d = docs(
      1L -> s"pay $valid1 or $invalid now",
      2L -> s"ids 12345678901234567 and $valid2.", // 17-digit run: no candidate
      3L -> "no digits at all",
      // the valid card's digits EMBEDDED in a longer run: the run is not
      // a candidate, and redaction of the standalone occurrence must not
      // rewrite the embedded copy
      4L -> s"big 9$valid1 vs $valid1 end")
    val out = TextAnalysis.luhnScrub(d, "text").orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("n_card_candidates"),
      r.getAs[Long]("n_luhn_valid"))).toSeq ==
      Seq((2L, 1L), (1L, 1L), (0L, 0L), (1L, 1L)))
    assert(out(0).getAs[String]("scrubbed") == s"pay <CARD> or $invalid now")
    assert(out(1).getAs[String]("scrubbed") == "ids 12345678901234567 and <CARD>.")
    assert(out(2).getAs[String]("scrubbed") == "no digits at all")
    assert(out(3).getAs[String]("scrubbed") == s"big 9$valid1 vs <CARD> end")
  }

  test("langId picks the language with the most marker hits") {
    val d = docs(
      1L -> "the cat is one of the pets and it is small",
      2L -> "le chat et la souris de la maison un jour",
      3L -> "der hund und die katze das haus ein tag")
    val out = TextAnalysis.langId(d).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("pred_lang")).toSeq == Seq("en", "fr", "de"))
  }

  test("quality score is bounded and favors stopword-rich text") {
    val d = docs(1L -> "the a of and is the a of and is", 2L -> "zz qq xx ww yy")
    val out = TextAnalysis.qualityScore(d).orderBy("doc_id").collect()
    val q = out.map(_.getAs[Double]("quality"))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("repetition signals: hand-computed ppm and the gopher gate") {
    // doc 1: "spam spam spam spam buy" — 5 words, top word 4
    // doc 2: 10 distinct words, no repeats
    val d = docs(
      1L -> "spam spam spam spam buy",
      2L -> "one two three four five six seven eight nine ten")
    val out = TextAnalysis.repetitionSignals(d).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_words") == 5)
    assert(r1.getAs[Long]("top_word_c") == 4)
    assert(r1.getAs[Long]("top_word_ppm") == 800000L) // 4e6/5
    assert(r1.getAs[Long]("top_bigram_c") == 3) // "spam spam" x3
    assert(r1.getAs[Long]("top_bigram_ppm") == 750000L) // 3e6/4
    assert(r1.getAs[Long]("top_trigram_c") == 2) // "spam spam spam" x2
    assert(r1.getAs[Long]("top_trigram_ppm") == 666666L) // floor(2e6/3)
    assert(r1.getAs[Long]("dup_word_c") == 4)
    assert(r1.getAs[Long]("distinct_words") == 2)
    assert(!r1.getAs[Boolean]("gopher_pass"))
    val r2 = out(1)
    assert(r2.getAs[Long]("top_word_ppm") == 100000L)
    assert(r2.getAs[Long]("dup_word_c") == 0)
    assert(r2.getAs[Long]("distinct_ppm") == 1000000L)
    assert(r2.getAs[Boolean]("gopher_pass"))
  }

  test("token counts: whitespace and BPE-ish bound") {
    val d = docs(1L -> "short and muchlongerword here")
    val r = TextAnalysis.tokenCounts(d).head()
    assert(r.getLong(1) == 4) // ws tokens
    // bpe-ish: shor|t, and, much|long|erwo|rd, here = 8 pieces
    assert(r.getLong(2) == 8)
  }

  test("bpeApplyMerge is greedy on adjacent repeats (replace-based merge was not)") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      (" a b a b ", "a b", " ab ab "), // adjacent repeat: BOTH merge
      (" a a a ", "a a", " aa a "), // leftmost-first, non-overlapping
      (" x a b c ", "a b", " x ab c "), // interior occurrence
      (" ba b ", "a b", " ba b "), // 'ba' ends in 'a' but is one symbol
      (" q ", "a b", " q ")) // single symbol passes through
    val out = cases.toDF("s", "mp", "want")
      .withColumn("got", graft.operators.TextAnalysis.bpeApplyMerge(col("s"), col("mp")))
      .collect()
    out.foreach(r => assert(r.getAs[String]("got") == r.getAs[String]("want"),
      s"merge(${r.getAs[String]("s")}, ${r.getAs[String]("mp")})"))
  }

  test("bpeTrain learns the hand-computed merge sequence with exact " +
    "tie-breaks and compression trajectory") {
    import org.apache.spark.sql.functions.col
    // corpus: low x2, lower, lowest — the textbook example
    val d = Seq((1L, "low lower lowest low")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(d, rounds = 4).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(m.length == 4)
    // round 1: "l o" and "o w" tie at 4; pair-asc tie-break picks "l o";
    // tokens after: lo w (x2) + lo w e r + lo w e s t = 4 + 4 + 5 = 13
    assert(m(0) == (1L, "l o", "lo", 4L, 13L))
    assert(m(1) == (2L, "lo w", "low", 4L, 9L))
    assert(m(2) == (3L, "low e", "lowe", 2L, 7L))
    // round 4: three pairs tie at 1; "lowe r" < "lowe s" < "s t"
    assert(m(3) == (4L, "lowe r", "lower", 1L, 6L))
    // vocabulary exhaustion stops the loop early instead of erroring
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val mt = TextAnalysis.bpeTrain(tiny, rounds = 10).collect()
    assert(mt.length == 1 && mt(0).getString(2) == "ab")
  }

  test("fingerprints are equal iff normalized text is equal") {
    val d = docs(1L -> "Hello  World", 2L -> "  hello world ", 3L -> "hello there")
    val fp = TextAnalysis.fingerprints(d).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  private def embs(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("knn brute force: identical vector ranks first with cosine 1") {
    val v = Seq(1f, 0f, 0f, 0f)
    val e = embs((0L, v, 0), (20L, v, 0), (21L, Seq(0f, 1f, 0f, 0f), 0),
      (22L, Seq(0.9f, 0.1f, 0f, 0f), 0))
    val out = Similarity.topKBrute(e, nQueries = 1, k = 3).orderBy("rk").collect()
    assert(out(0).getLong(2) == 20L && out(0).getDouble(3) == 1.0)
    assert(out(1).getLong(2) == 22L) // near-parallel second
    assert(out(2).getLong(2) == 21L) // orthogonal last, cosine 0
    assert(out(2).getDouble(3) == 0.0)
  }

  test("label-probed knn only searches the query's label") {
    val v = Seq(1f, 0f)
    val e = embs((0L, v, 0), (20L, v, 1), (21L, Seq(0.8f, 0.2f), 0))
    val out = Similarity.topKByLabel(e, nQueries = 1, k = 5).collect()
    assert(out.map(_.getLong(2)).toSet == Set(21L)) // 20L is in another cell
  }

  test("embedding dup pairs finds planted duplicates within a label") {
    val v = Seq(0.5f, 0.5f, 0.1f)
    val e = embs((1L, v, 0), (2L, v, 0), (3L, Seq(-0.5f, 0.4f, 0.0f), 0),
      (4L, v, 1)) // same vector, different label: blocked
    val out = Similarity.embeddingDupPairs(e, 0.99).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("IVF multiprobe: full-probe equals brute-force L2; one probe stays inside its cells") {
    // two tight planted clusters; vec 0 and 1 seed the Lloyd fit (k=2)
    val near = (0 until 6).map(i => (i * 2L, Seq(1f + i * 0.01f, 0f, 0f), 0))
    val far = (0 until 6).map(i => (i * 2L + 1L, Seq(0f, 1f + i * 0.01f, 0f), 1))
    val e = embs(near ++ far: _*)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = rows(Similarity.topKBruteL2(e, nQueries = 2, k = 4))
    // probing every cell = brute force, rank for rank
    val full = rows(Similarity.topKIvfMultiprobe(e, nQueries = 2, k = 4,
      kClusters = 2, iters = 2, nprobe = 2))
    assert(full == brute, s"full-probe $full != brute $brute")
    // single probe: query 0 (cluster of the 1-axis) must only return
    // even vec_ids — the other cell is never touched
    val one = Similarity.topKIvfMultiprobe(e, nQueries = 1, k = 4,
      kClusters = 2, iters = 2, nprobe = 1).collect()
    assert(one.nonEmpty && one.forall(_.getLong(2) % 2 == 0), one.mkString(","))
  }

  test("frame sampling keeps every stride-th byte") {
    val d = docs(1L -> "abcdefghij") // 10 bytes
    val media = Multimodal.attachPayload(d)
    val r = Multimodal.frameSample(media, stride = 3).head()
    assert(r.getLong(0) == 1L)
    assert(r.getInt(1) == 4) // positions 0,3,6,9
    assert(r.getInt(2) == 'a'.toInt + 'd'.toInt + 'g'.toInt + 'j'.toInt)
  }

  // deterministic 64-dim fixture for the persisted-ANN-index lifecycle
  // (pqCode slices assume dim 64); ids 0..n-1, three labels
  private def embs64(ids: Seq[Long]) =
    ids.map(i => (i,
      Seq.tabulate(64)(d => (((i * 31 + d * 7) % 11) - 5) / 10f),
      (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")

  test("persisted ANN index: PQ and IVF probes match the inline plans; bucket metadata stored") {
    val e = embs64(0L until 14L)
    Similarity.writeAnnIndex(e, kClusters = 2, iters = 2,
      codesTable = "spec_ann_codes", vecTable = "spec_ann_vecs",
      centroidTable = "spec_ann_cents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val pqStored = rows(Similarity.probePqIndex(spark, nQueries = 3, k = 4,
      radius = 8, codesTable = "spec_ann_codes", vecTable = "spec_ann_vecs"))
    val pqInline = rows(Similarity.topKPqRerank(e, nQueries = 3, k = 4, radius = 8))
    assert(pqStored == pqInline && pqStored.nonEmpty)
    val ivfStored = rows(Similarity.probeIvfIndex(spark, nQueries = 3, k = 4,
      nprobe = 2, codesTable = "spec_ann_codes", vecTable = "spec_ann_vecs",
      centroidTable = "spec_ann_cents"))
    val ivfInline = rows(Similarity.topKIvfMultiprobe(e, nQueries = 3, k = 4,
      kClusters = 2, iters = 2, nprobe = 2))
    assert(ivfStored == ivfInline && ivfStored.nonEmpty)
    // the layout claim: codes bucketed by cluster (IVF probes read cells
    // exchange-free), vectors bucketed by vec_id (shortlist fetch by key)
    def desc(t: String) = spark.sql(s"DESCRIBE FORMATTED $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val dc = desc("spec_ann_codes")
    assert(dc.get("Num Buckets").exists(_.trim == "8"), dc.get("Num Buckets"))
    assert(dc.get("Bucket Columns").exists(_.contains("cluster")))
    val dv = desc("spec_ann_vecs")
    assert(dv.get("Bucket Columns").exists(_.contains("vec_id")))
  }

  test("ensureAnnIndex builds once, skips when fresh, rebuilds on growth or new params") {
    val e = embs64(0L until 10L)
    def ensure(d: org.apache.spark.sql.DataFrame, kc: Int = 2) =
      Similarity.ensureAnnIndex(d, kClusters = kc, iters = 1,
        codesTable = "spec_ann2_codes", vecTable = "spec_ann2_vecs",
        centroidTable = "spec_ann2_cents")
    spark.sql("DROP TABLE IF EXISTS spec_ann2_codes")
    spark.sql("DROP TABLE IF EXISTS spec_ann2_vecs")
    spark.sql("DROP TABLE IF EXISTS spec_ann2_cents")
    assert(ensure(e), "first call must build")
    assert(!ensure(e), "fresh index must be served, not rebuilt")
    assert(ensure(embs64(0L until 12L)), "vector-count growth must rebuild")
    assert(ensure(embs64(0L until 12L), kc = 3),
      "a different quantizer parameterization must rebuild")
  }

  test("appendAnnIndex commits a batch: the next probe sees it, history unread") {
    val e = embs64(0L until 10L)
    Similarity.writeAnnIndex(e, kClusters = 2, iters = 1,
      codesTable = "spec_ann3_codes", vecTable = "spec_ann3_vecs",
      centroidTable = "spec_ann3_cents")
    // the appended batch clones vector 0 under new ids — they must surface
    // as its nearest stored neighbors on the next probe
    val batch = embs64(Seq(0L)).selectExpr(
      "vec_id + 100 AS vec_id", "embedding", "label")
    Similarity.appendAnnIndex(batch, codesTable = "spec_ann3_codes",
      vecTable = "spec_ann3_vecs", centroidTable = "spec_ann3_cents")
    assert(spark.table("spec_ann3_vecs").count() == 11L)
    val top = Similarity.probePqIndex(spark, nQueries = 1, k = 1, radius = 0,
        codesTable = "spec_ann3_codes", vecTable = "spec_ann3_vecs")
      .collect()
    assert(top.nonEmpty && top.head.getLong(2) == 100L &&
      top.head.getDouble(3) == 1.0, top.mkString(","))
  }

  test("pq codes are stable and bucket identical vectors together") {
    val v = Seq.fill(64)(0.25f)
    val e = Seq((1L, v, 0), (2L, v, 1), (3L, v.map(-_), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.pqQuantize(e).orderBy("vec_id").collect()
    assert(out(0).getInt(2) == out(1).getInt(2)) // identical vectors, same code
    assert(out(0).getInt(2) != out(2).getInt(2)) // negated vector differs
    assert(out(0).getLong(3) == 2L) // two vectors share the code
  }

  test("multimodal plumbing: payload survives, undecodable input is EXPLICIT nulls") {
    val d = docs(7L -> "some payload text")
    val media = Multimodal.attachPayload(d)
    val row = media.collect().head
    assert(row.doc_id == 7L)
    assert(new String(row.payload, "UTF-8") == "some payload text")
    assert(row.meta.nBytes == 17)
    assert(row.meta.formatGuess == "unknown")
    // text bytes parse as no media format: every decode field is None —
    // the engine declines rather than fabricating dimensions/features
    val f = Multimodal.decodeFeatures(media).collect().head
    assert(f.width.isEmpty && f.height.isEmpty && f.channels.isEmpty &&
      f.features.isEmpty)
    // and the null lands in the DataFrame schema as a real SQL NULL
    val df = Multimodal.decodeFeatures(media).toDF()
    assert(df.filter(org.apache.spark.sql.functions.col("width").isNull).count() == 1)
  }
}
