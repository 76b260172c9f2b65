package graft

import graft.operators.Dedup

/** Tests for the dedup operators on small inline corpora with known
  * duplicate structure.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base + " dup"
  private val other = "completely different words about spark query engines and big data systems here"

  test("removeDupSpans splices every non-first duplicate window out of the text") {
    // winLen=5; d1 holds the first occurrence of every shared window.
    // d2: one interior dup span. d3: a WITHIN-doc dup (zzzzz at pos 0 and
    // 1, keep-first exempts pos 0) whose span merges (gap == winLen) with
    // the cross-doc dup of d1's whole text — one interval [1,16). d4: two
    // spans separated by a gap > winLen stay separate intervals.
    val d = docs(
      1L -> "abcdefghij",
      2L -> "xxabcdeyy",
      3L -> "zzzzzzabcdefghij",
      4L -> "abcde123456789012bcdef",
      5L -> "tiny") // shorter than winLen: no windows, must pass through
    val out = Dedup.removeDupSpans(d, winLen = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
        r.getAs[Int]("n_spans")))
      .toSeq
    assert(out == Seq(
      (1L, "abcdefghij", 0),
      (2L, "xxyy", 1),
      (3L, "z", 1),
      (4L, "123456789012", 2),
      (5L, "tiny", 0)))
  }

  test("exact dedup keeps the lowest doc_id per identical text") {
    val d = docs(1L -> base, 2L -> base, 3L -> other)
    val out = Dedup.exactDedup(d).orderBy("keep_doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("word shingles are distinct k-grams") {
    val d = docs(1L -> "a b a b a")
    val sh = d.select(Dedup.wordShingles($"text", 3)).head().getSeq[String](0)
    assert(sh.toSet == Set("a b a", "b a b"))
  }

  test("minhash signatures are equal for identical shingle sets") {
    val d = docs(1L -> base, 2L -> base, 3L -> other)
    val sig = Dedup.minhashSignatures(d, 3).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("minhash LSH finds the planted near-duplicate and skips unrelated docs") {
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other,
      4L -> "yet another unrelated sentence with its own distinct vocabulary set entirely")
    val pairs = Dedup.minhashLsh(d, 3, 2, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash of a near-duplicate is close; unrelated text is far") {
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val sims = Dedup.simhashTable(d, 3).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(2L)) <= 6)
    assert(ham(sims(1L), sims(3L)) > 6)
  }

  test("dedup clusters: transitive near-dups share a component, others are singletons") {
    // 1-2 and 2-5 are near-dups (1-5 only transitively); 3, 4 unrelated
    val d = docs(1L -> base, 2L -> nearDup, 5L -> (base + " dup extra"),
      3L -> other,
      4L -> "yet another unrelated sentence with its own distinct vocabulary set entirely")
    val clusters = Dedup.dedupClusters(d, 3, 2, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(5L) == 1L)
    assert(clusters(3L) == 3L && clusters(4L) == 4L)
  }

  test("winnowing guarantee: a shared substring of length >= gram+window-1 shares a fingerprint") {
    import org.apache.spark.sql.functions._
    // 5-char grams, window 8: any shared run of >= 12 chars must produce at
    // least one common window-minimum (the MOSS guarantee)
    val shared = "zqxjkvwpyfgmbdh utnrceloaiszzqx"   // 31 chars, plenty
    val d = docs(
      1L -> s"first document prefix $shared and its own ending words",
      2L -> s"completely other opening $shared trailing different tail",
      3L -> "no overlap here at all just plain unrelated filler text content")
    val fps = Dedup.winnowFingerprints(d, window = 8)
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs should not collide here")
  }

  test("dedup clusters refuse to return silently-truncated components") {
    // the 1-2-5 chain needs >= 2 propagation rounds; maxIters = 1 must
    // throw, not return a split component
    val d = docs(1L -> base, 2L -> nearDup, 5L -> (base + " dup extra"))
    val e = intercept[IllegalStateException] {
      Dedup.dedupClusters(d, 3, 2, 0.5, maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("banded simhash64: equi-join candidates catch radius-0 dups, skip far docs") {
    // radius <= 3 is a tight guarantee: an appended suffix flips ~5-6 of 63
    // bits even on long docs, so the deterministic fixture uses an exact
    // duplicate (radius 0) plus unrelated text; the sf-level oracle checks
    // real near-dup behavior.
    val long1 = (1 to 80).map(i => s"word$i").mkString(" ")
    val unrelated = (1 to 80).map(i => s"other$i term$i").mkString(" ")
    val d = docs(1L -> long1, 2L -> long1, 3L -> unrelated)
    val out = Dedup.simhash64BandedPairs(d, 3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(out.head.getInt(2) == 0) // identical texts, hamming zero
  }

  test("ngram jaccard pairs respect the threshold") {
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val out = Dedup.ngramJaccardPairs(d, 3, 0.5).collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == (1L, 2L))
    assert(out(0).getDouble(2) > 0.5 && out(0).getDouble(2) < 1.0)
  }

  test("prefix jaccard join is EXACT: equals the brute-force all-pairs result") {
    import org.apache.spark.sql.functions._
    // 30 docs: 10 base sentences x 3 variants (identical / one word changed /
    // shuffled tail) + planted unrelated docs — enough pair structure that a
    // recall bug in the prefix or length filter would drop a pair.
    val rows = (0 until 10).flatMap { i =>
      val words = (0 until 12).map(w => s"w${(i * 7 + w * 3) % 17}")
      val v0 = words.mkString(" ")
      val v1 = (words.dropRight(1) :+ s"zz$i").mkString(" ")
      val v2 = (words.take(6) ++ words.drop(6).reverse).mkString(" ")
      Seq((i * 3 + 0L) -> v0, (i * 3 + 1L) -> v1, (i * 3 + 2L) -> v2)
    }
    // plus a pair engineered to be a BASIC-prefix candidate but NOT a
    // midprefix candidate (and not a true pair): distinct 6-word prefixes
    // + a shared 8-word suffix give 6 unique + 6 shared trigrams per doc;
    // unique tokens (df=1) sort first, so the first shared token sits at
    // pos 7 — inside the basic prefix (12−6+1=7), outside the midprefix
    // (12−ceil(2·0.5/1.5·12)+1=5). Jaccard 6/18 < 0.5, so dropping the
    // candidate cannot change the verified result.
    val common = (0 until 8).map(k => s"cc$k").mkString(" ")
    val engineered = Seq(
      100L -> ((0 until 6).map(k => s"pa$k").mkString(" ") + " " + common),
      101L -> ((0 until 6).map(k => s"qb$k").mkString(" ") + " " + common))
    val d = docs(rows ++ engineered: _*)
    val got = Dedup.prefixJaccardPairs(d, 0.5)
      .select("i", "j", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same hashed-trigram token sets
    val tok = d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 3)," +
          " i -> concat(ws[i], '_', ws[i+1], '_', ws[i+2]))")).as("tk"))
      .select(col("doc_id"), graft.functions.HashFunctions.hash32(col("tk")).as("h"))
      .distinct()
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val want = tok.as("a").join(tok.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("i"), col("n").as("la")), "i")
      .join(sz.select(col("doc_id").as("j"), col("n").as("lb")), "j")
      .filter(col("inter").cast("double") /
        (col("la") + col("lb") - col("inter")) >= 0.5)
      .select("i", "j", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "test corpus produced no qualifying pairs")
    assert(got == want)
    // the PPJoin midprefix bound admits strictly fewer candidates than the
    // basic prefix filter (the engineered pair above is dropped) while the
    // verified result stays exact — candidate work shrinks, recall doesn't
    val nMid = Dedup.prefixJaccardCandidates(d, 0.5, midPrefix = true).count()
    val nBasic = Dedup.prefixJaccardCandidates(d, 0.5, midPrefix = false).count()
    assert(nMid < nBasic, s"midprefix candidates $nMid !< basic $nBasic")
    val midSet = Dedup.prefixJaccardCandidates(d, 0.5, midPrefix = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.forall { case (i, j, _) => midSet.contains((i, j)) },
      "midprefix filter dropped a TRUE pair")
  }

  test("delta dedup pairs NEW against OLD only — history never self-pairs") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      5L -> base, // NEW side (doc_id % 5 == 0)
      1L -> nearDup, // old: near-dup of base
      2L -> base, // old: exact dup of the new doc
      3L -> other) // old: unrelated
    val out = Dedup.deltaDedupPairs(
        d.filter(col("doc_id") % 5 === 0), d.filter(col("doc_id") % 5 =!= 0),
        shingleK = 3, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((5L, 2L)), s"exact dup across the split not found: $out")
    assert(out.contains((5L, 1L)), s"near dup across the split not found: $out")
    // the old x old dup pair (1, 2) must NOT appear: every row is new x old
    assert(out.forall(_._1 == 5L), s"history self-pair leaked: $out")
  }

  test("delta dedup hashes each side's shingles once (exchange reuse)") {
    import org.apache.spark.sql.functions.col
    val d = docs(5L -> base, 1L -> nearDup, 2L -> base, 3L -> other)
    val out = Dedup.deltaDedupPairs(
      d.filter(col("doc_id") % 5 === 0), d.filter(col("doc_id") % 5 =!= 0),
      shingleK = 3, rowsPerBand = 2, threshold = 0.5)
    out.collect()
    // the banded index and the verify arrays read the same repartitioned
    // hashed-shingle relation; if the subtrees ever stop canonicalizing
    // identically, the md5 pass silently doubles — pin the reuse here
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no exchange reuse in delta-dedup plan:\n$plan")
  }

  test("persisted LSH index: probe answers match the stateless recompute; index scan is bucketed") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      5L -> base, 10L -> other, // NEW side
      1L -> nearDup, 2L -> base, 3L -> other, // history
      4L -> "yet another unrelated sentence with its own distinct vocabulary set entirely")
    val newDocs = d.filter(col("doc_id") % 5 === 0)
    val hist = d.filter(col("doc_id") % 5 =!= 0)
    Dedup.writeLshIndex(hist, shingleK = 3, rowsPerBand = 2,
      indexTable = "spec_lsh_index", shingleTable = "spec_lsh_shingles")
    val probe = Dedup.probeLshIndex(newDocs, shingleK = 3, rowsPerBand = 2,
      threshold = 0.5, indexTable = "spec_lsh_index", shingleTable = "spec_lsh_shingles")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs(Dedup.deltaDedupPairs(newDocs, hist, 3, 2, 0.5))
    assert(want == Set((5L, 1L), (5L, 2L), (10L, 3L)), s"recompute reference: $want")
    assert(pairs(probe) == want)
    // what the lifecycle must never lose is the stored (band, key) bucket
    // METADATA — without it no plan at any scale could skip the index-side
    // exchange (whether a given plan exploits it is size-dependent: at
    // fixture scale the delta broadcasts). Read it back from the catalog.
    val desc = spark.sql("DESCRIBE FORMATTED spec_lsh_index").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Num Buckets").exists(_.trim == "8"), desc.get("Num Buckets"))
    assert(desc.get("Bucket Columns").exists(v =>
      v.contains("band") && v.contains("key")), desc.get("Bucket Columns"))
    // ONE data file per bucket: the writer repartitions on the bucket
    // columns first, so the layout is at most `buckets` parquet files —
    // without that, every upstream task writes a file per bucket it
    // touches (measured 249-257 ~8 KB files at sf0.1) and a COLD probe
    // pays ~250 opens + footer reads before its first byte of data.
    for (t <- Seq("spec_lsh_index", "spec_lsh_shingles")) {
      val loc = spark.sql(s"DESCRIBE FORMATTED $t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
        .apply("Location").trim.stripPrefix("file:")
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(loc))
      val nData =
        try files.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .count()
        finally files.close()
      assert(nData <= 8, s"$t has $nData data files (want <= 8 buckets)")
    }
  }

  test("ensureLshIndex builds once, skips when fresh, rebuilds on history growth") {
    val hist = docs(1L -> nearDup, 2L -> base, 3L -> other)
    def ensure(d: org.apache.spark.sql.DataFrame) = Dedup.ensureLshIndex(d,
      shingleK = 3, rowsPerBand = 2,
      indexTable = "spec_ensure_index", shingleTable = "spec_ensure_shingles")
    spark.sql("DROP TABLE IF EXISTS spec_ensure_index")
    spark.sql("DROP TABLE IF EXISTS spec_ensure_shingles")
    assert(ensure(hist), "first call must build")
    assert(!ensure(hist), "fresh index must be reused, not rebuilt")
    // grow history: the stored shingle count no longer matches -> rebuild
    val grown = docs(1L -> nearDup, 2L -> base, 3L -> other,
      4L -> "yet another unrelated sentence with its own completely distinct vocabulary")
    assert(ensure(grown), "stale index (doc-count mismatch) must rebuild")
    assert(spark.table("spec_ensure_shingles").count() == 4L)
    assert(!ensure(grown), "rebuilt index must again be reused")
    // DIFFERENT build parameters with the SAME eligible-doc count: the
    // stored parameter fingerprint must force a rebuild (a count-only
    // freshness key would silently serve stale-parameter candidates)
    assert(Dedup.ensureLshIndex(grown, shingleK = 4, rowsPerBand = 2,
      indexTable = "spec_ensure_index", shingleTable = "spec_ensure_shingles"),
      "changed shingleK must rebuild")
    assert(Dedup.ensureLshIndex(grown, shingleK = 4, rowsPerBand = 4,
      indexTable = "spec_ensure_index", shingleTable = "spec_ensure_shingles"),
      "changed rowsPerBand must rebuild")
    assert(!Dedup.ensureLshIndex(grown, shingleK = 4, rowsPerBand = 4,
      indexTable = "spec_ensure_index", shingleTable = "spec_ensure_shingles"),
      "same parameters again must be reused")
    // hostile table names are rejected before any SQL is assembled
    intercept[IllegalArgumentException] {
      Dedup.ensureLshIndex(hist, 3, 2,
        indexTable = "x; DROP TABLE y", shingleTable = "spec_ensure_shingles")
    }
  }

  test("appendLshIndex commits a batch: the next probe matches against it, buckets intact") {
    import org.apache.spark.sql.functions.col
    val hist = docs(1L -> base, 3L -> other)
    Dedup.writeLshIndex(hist, shingleK = 3, rowsPerBand = 2,
      indexTable = "spec_append_index", shingleTable = "spec_append_shingles")
    val batch1 = docs(10L -> nearDup)
    def probe(d: org.apache.spark.sql.DataFrame) =
      Dedup.probeLshIndex(d, shingleK = 3, rowsPerBand = 2, threshold = 0.5,
          indexTable = "spec_append_index", shingleTable = "spec_append_shingles")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(batch1) == Set((10L, 1L)))
    Dedup.appendLshIndex(batch1, shingleK = 3, rowsPerBand = 2,
      indexTable = "spec_append_index", shingleTable = "spec_append_shingles")
    // a second batch near-dups doc 10 — ONLY findable through the appended
    // rows (its jaccard vs doc 1 also clears 0.5: both pairs must appear)
    val batch2 = docs(20L -> (nearDup + " extra"))
    val got = probe(batch2)
    assert(got.contains((20L, 10L)), s"appended history row not matched: $got")
    assert(got == Set((20L, 10L), (20L, 1L)), got.toString)
    // the append preserved the stored bucket METADATA the probe relies on
    val desc = spark.sql("DESCRIBE FORMATTED spec_append_index").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Num Buckets").exists(_.trim == "8"), desc.get("Num Buckets"))
    // and the shingle store now carries history + batch1
    assert(spark.table("spec_append_shingles")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet == Set(1L, 3L, 10L))
  }

  test("containment join catches a short doc QUOTED in a long one that jaccard misses") {
    // b = a 10-word quote from the middle of a: every trigram of b is in a,
    // so containment = 1.0 — while jaccard is only 8/28 ≈ 0.29 and the
    // jaccard join at tau 0.6 structurally cannot return the pair
    val words = (0 until 30).map(i => s"w$i")
    val a = words.mkString(" ") // 28 trigrams
    val b = words.slice(10, 20).mkString(" ") // 8 trigrams, all inside a
    val far = "totally unrelated content about query engines and shuffles okay"
    val d = docs(1L -> a, 2L -> b, 3L -> far)
    val got = Dedup.containmentPairs(d, 0.9)
      .select("i", "j", "inter", "m_min", "contain").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 2L, 8L, 8L, 1.0)), got.toSeq)
    assert(Dedup.prefixJaccardPairs(d, 0.6).count() == 0)
  }

  test("containment recall: the SMALLER side's prefix alone finds the pair") {
    // the long doc's prefix tokens (rare ones) may all lie OUTSIDE the
    // quote; recall must come from the small doc probing the full index.
    // 60-word doc vs an 8-word quote: pair must still surface at tau 0.75
    // (6 of the quote's 6 trigrams are in the long doc -> containment 1.0)
    val words = (0 until 60).map(i => s"v$i")
    val long = words.mkString(" ")
    val quote = words.slice(30, 38).mkString(" ")
    val d = docs(7L -> long, 9L -> quote)
    val got = Dedup.containmentPairs(d, 0.75).collect()
    assert(got.length == 1 && got.head.getLong(0) == 7L && got.head.getLong(1) == 9L)
  }

  test("prefix jaccard join survives non-dyadic tau at the exact boundary") {
    // tau = 0.55 is not a dyadic rational: the double product 0.55*20 is
    // 11.000000000000002, so an unguarded ceil() yields 12 and the PPJoin
    // length filter demands |b| >= 12 — silently dropping a true pair with
    // |a| = 20, |b| = 11, inter = 11 (jaccard exactly 11/20 = 0.55 >= tau).
    // Construct exactly that: 22 distinct words -> 20 distinct trigrams;
    // the 13-word prefix -> 11 trigrams, all contained in the first set.
    val words = (0 until 22).map(i => s"w$i")
    val a = words.mkString(" ") // 20 trigram tokens
    val b = words.take(13).mkString(" ") // 11 tokens, subset of a's
    val far = "totally unrelated content about query engines and shuffles okay"
    val d = docs(1L -> a, 2L -> b, 3L -> far)
    val got = Dedup.prefixJaccardPairs(d, 0.55)
      .select("i", "j", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 11L)))
  }

  test("sim64 index lifecycle: probe == one-shot recompute; ensure builds once; append visible") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def hashes(rows: (Long, Long)*) = rows.toSeq.toDF("doc_id", "sim64")
    // history: 1 and 2 are Hamming-1 apart, 3 is far; new doc 10 is
    // Hamming-2 from 1 (bits 0 and 17 -> two DIFFERENT bands, so only the
    // two intact bands can generate the candidate)
    val h1 = 0x0123456789abcdefL
    val hist = hashes(1L -> h1, 2L -> (h1 ^ 1L), 3L -> 0x7edcba9876543210L)
    val newDocs = hashes(10L -> (h1 ^ 1L ^ (1L << 17)))
    var builds = 0
    def ensure(h: org.apache.spark.sql.DataFrame, n: Long): Boolean = {
      val b = Dedup.ensureSim64Index({ builds += 1; h }, n,
        indexTable = "spec_sim64_index")
      b
    }
    assert(ensure(hist, 3), "first ensure must build")
    assert(!ensure(hist, 3), "fresh index must be reused")
    val probe1 = Dedup.probeSim64Index(newDocs, maxHamming = 2,
      indexTable = "spec_sim64_index")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").longValue)).toSet
    // one-shot reference: banded64Pairs over the union, restricted to
    // (new, old) cross pairs
    val ref = Dedup.banded64Pairs(hist.unionAll(newDocs), maxHamming = 2)
      .collect()
      .flatMap { r =>
        val (a, b, hm) =
          (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").longValue)
        if (a == 10L) Some((a, b, hm))
        else if (b == 10L) Some((b, a, hm)) else None
      }.toSet
    assert(probe1 == ref, s"probe $probe1 != recompute $ref")
    assert(probe1.map(p => (p._1, p._2)) == Set((10L, 1L), (10L, 2L)))
    // commit the batch; a second batch must match against it through the
    // STORED rows only
    Dedup.appendSim64Index(newDocs, "spec_sim64_index")
    assert(!ensure(hist.unionAll(newDocs), 4),
      "appended index must count as fresh for the grown corpus")
    val batch2 = hashes(20L -> (h1 ^ 1L ^ (1L << 17))) // == doc 10's hash
    val probe2 = Dedup.probeSim64Index(batch2, maxHamming = 2,
      indexTable = "spec_sim64_index")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe2.contains((20L, 10L)), s"appended row not matched: $probe2")
    // by-name contract: the fingerprint frame was CONSTRUCTED only for
    // the one build, never for the fresh-skip ensures
    assert(builds == 1, s"hashes evaluated $builds times (want 1 build)")
    // layout: at most one data file per bucket per write (build + append)
    val loc = spark.sql("DESCRIBE FORMATTED spec_sim64_index").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .apply("Location").trim.stripPrefix("file:")
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(loc))
    val nData =
      try files.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
      finally files.close()
    assert(nData <= 16, s"$nData data files (want <= 8 buckets x 2 writes)")
  }
}
