package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.{SortedLongArrayIntersectCount, VectorDotProduct}

/** Equivalence guards for the native expressions: they must produce exactly
  * the values of the declarative forms they replace, under both whole-stage
  * codegen and the interpreted path (nullSafeEval), including nulls and
  * degenerate inputs.
  */
class ExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("sorted_intersect_count equals size(array_intersect) on random sorted sets") {
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      SortedLongArrayIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("sorted_intersect_count: nulls propagate, empty arrays count zero") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L))),
      (Some(Seq(1L, 2L)), Some(Seq(1L, 2L))))
      .toDF("a", "b")
      .select(SortedLongArrayIntersectCount(col("a"), col("b")).as("c"))
      .collect()
    assert(df(0).isNullAt(0))
    assert(df(1).getInt(0) == 0)
    assert(df(2).getInt(0) == 2)
  }

  test("vector_dot is bit-identical to the declarative zip_with fold") {
    val rows = Seq.fill(100)(
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val declarative = aggregate(
      zip_with(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double")),
        (x, y) => x * y),
      lit(0.0d), (s, x) => s + x)
    val df = rows.toDF("a", "b").select(
      VectorDotProduct(col("a"), col("b")).as("fast"), declarative.as("ref"))
    // exact bit equality, not tolerance — the oracle contract depends on it
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("vector_dot: length mismatch yields null under codegen and interpreted eval") {
    // a truncated embedding must never score as a plausible cosine
    val rows = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f)),      // mismatched
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))            // matched
    val codegen = rows.toDF("a", "b")
      .select(VectorDotProduct(col("a"), col("b")).as("d")).collect()
    assert(codegen(0).isNullAt(0))
    assert(codegen(1).getDouble(0) == 11.0)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val interp = rows.toDF("a", "b")
      .select(VectorDotProduct(col("a"), col("b")).as("d")).collect()
    assert(interp(0).isNullAt(0))
    assert(interp(1).getDouble(0) == 11.0)
  }

  test("native expressions agree with codegen disabled (interpreted eval path)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val df = Seq((Seq(1L, 3L, 5L), Seq(3L, 4L, 5L), Seq(1.0f, 2.0f), Seq(0.5f, 0.25f)))
      .toDF("a", "b", "x", "y")
      .select(
        SortedLongArrayIntersectCount(col("a"), col("b")).as("c"),
        VectorDotProduct(col("x"), col("y")).as("d"))
      .head()
    assert(df.getInt(0) == 2)
    assert(df.getDouble(1) == 1.0)
  }

  test("sliding_min equals per-window array_min over random arrays") {
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(60))(rnd.nextLong() % 1000L))
    for (w <- Seq(1, 3, 8)) {
      val df = rows.toDF("gh").select(
        graft.plans.SlidingMin(col("gh"), w).as("fast"),
        // the compositional form this expression replaces (guarded:
        // Spark's sequence(1, 0) DESCENDS, so short arrays need the
        // explicit empty branch)
        when(size(col("gh")) >= w,
          transform(sequence(lit(1), size(col("gh")) - (w - 1)),
            i => array_min(slice(col("gh"), i, lit(w)))))
          .otherwise(slice(col("gh"), 1, 0)).as("ref"))
      assert(df.filter(not(col("fast") <=> col("ref"))).count() == 0, s"w=$w")
    }
  }

  test("sliding_min: short input empty, null array propagates, " +
    "interpreted path agrees") {
    val out = Seq(
      (1, Some(Seq(5L, 2L))), // shorter than window
      (2, None),
      (3, Some(Seq(9L, 4L, 7L, 1L, 8L))))
      .toDF("id", "gh")
      .select(col("id"), graft.plans.SlidingMin(col("gh"), 3).as("m"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == Seq.empty)
    assert(out(1).isNullAt(1))
    assert(out(2).getSeq[Long](1) == Seq(4L, 1L, 1L))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val v = Seq(Seq(9L, 4L, 7L, 1L, 8L)).toDF("gh")
      .select(graft.plans.SlidingMin(col("gh"), 3).as("m"))
      .head().getSeq[Long](0)
    assert(v == Seq(4L, 1L, 1L))
  }

  test("winnow_fingerprints equals the compositional ascii/substr chain " +
    "(incl. non-ASCII code points)") {
    val alphabet = "abcde xyzé€¿ñ"
    val rows = Seq.fill(200)(
      String.valueOf(Array.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))))) ++
      Seq("", "abcd", "abcdefghijk", "ééééééééééééééé")
    for (w <- Seq(1, 4, 8)) {
      def ch(i: Column, off: Int): Column =
        ascii(col("s").substr(if (off == 0) i else i + off, lit(1))).cast("long")
      val gram = (i: Column) =>
        ch(i, 0) * 923521L + ch(i, 1) * 29791L + ch(i, 2) * 961L + ch(i, 3) * 31L + ch(i, 4)
      val df = rows.toDF("s")
        .filter(length(col("s")) >= 5 + w - 1)
        .select(
          graft.plans.WinnowFingerprints(col("s"), w).as("fast"),
          sort_array(array_distinct(
            transform(sequence(lit(1), length(col("s")) - 4 - (w - 1)),
              i => array_min(slice(
                transform(sequence(lit(1), length(col("s")) - 4), gram),
                i, lit(w)))))).as("ref"))
      assert(df.filter(not(col("fast") <=> col("ref"))).count() == 0, s"w=$w")
    }
  }

  test("winnow_fingerprints: short input empty, null propagates, " +
    "interpreted path agrees") {
    val out = Seq((1, Some("abc")), (2, None), (3, Some("aaaaaabc")))
      .toDF("id", "s")
      .select(col("id"), graft.plans.WinnowFingerprints(col("s"), 4).as("f"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == Seq.empty)
    assert(out(1).isNullAt(1))
    assert(out(2).getSeq[Long](1).nonEmpty)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = {
      import s2.implicits._
      Seq("the quick brown fox").toDF("s")
        .select(graft.plans.WinnowFingerprints(col("s"), 4).as("f"))
        .head().getSeq[Long](0)
    }
    val gen = Seq("the quick brown fox").toDF("s")
      .select(graft.plans.WinnowFingerprints(col("s"), 4).as("f"))
      .head().getSeq[Long](0)
    assert(interp == gen && gen.nonEmpty)
  }

  test("window_substrings equals transform+substring (incl. non-ASCII)") {
    val alphabet = "abc defé€ñ"
    val rows = Seq.fill(200)(
      String.valueOf(Array.fill(rnd.nextInt(50))(
        alphabet(rnd.nextInt(alphabet.length))))) ++
      Seq("", "ab", "ééééé")
    for (w <- Seq(1, 3, 20)) {
      val df = rows.toDF("s").select(
        graft.plans.WindowSubstrings(col("s"), w).as("fast"),
        when(length(col("s")) >= w,
          transform(sequence(lit(1), length(col("s")) - (w - 1)),
            i => col("s").substr(i, lit(w))))
          .otherwise(array().cast("array<string>")).as("ref"))
      assert(df.filter(not(col("fast") <=> col("ref"))).count() == 0, s"w=$w")
    }
    // null propagates; interpreted path agrees
    val nul = Seq((1, None: Option[String]), (2, Some("abcdef")))
      .toDF("id", "s")
      .select(col("id"), graft.plans.WindowSubstrings(col("s"), 3).as("v"))
      .orderBy("id").collect()
    assert(nul(0).isNullAt(1))
    assert(nul(1).getSeq[String](1) == Seq("abc", "bcd", "cde", "def"))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = {
      import s2.implicits._
      Seq("abcdef").toDF("s")
        .select(graft.plans.WindowSubstrings(col("s"), 3).as("v"))
        .head().getSeq[String](0)
    }
    assert(interp == Seq("abc", "bcd", "cde", "def"))
  }

  /** Reference implementation: hash every window independently with the
    * same polynomial — no rolling reuse, so a recurrence bug cannot hide.
    */
  private def bruteHashes(s: String, w: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    (0 to bytes.length - w).map { i =>
      var h = 0L
      for (j <- i until i + w) h = h * graft.plans.RollingWindowHashes.Base + (bytes(j) & 0xffL)
      h
    }
  }

  test("rolling_window_hashes equals independent per-window hashing") {
    val strs = Seq.fill(100)(
      Seq.fill(rnd.nextInt(60))(('a' + rnd.nextInt(26)).toChar).mkString) ++
      Seq("", "éàü-multibyte çhärs €", "exact") // byte-window semantics incl. UTF-8
    for (w <- Seq(1, 5, 20)) {
      val got = strs.toDF("s")
        .select(graft.plans.RollingWindowHashes(col("s"), w).as("h"))
        .as[Seq[Long]].collect()
      val want = strs.map(bruteHashes(_, w))
      assert(got.toSeq == want, s"w=$w")
    }
  }

  test("rolling_window_hashes: null propagates; short input yields empty; interpreted path agrees") {
    val rows = Seq(Some("abcdef"), Some("ab"), None)
    def run(session: org.apache.spark.sql.SparkSession) = {
      import session.implicits._
      rows.toDF("s")
        .select(graft.plans.RollingWindowHashes(col("s"), 3).as("h")).collect()
    }
    for (r <- Seq(run(spark), {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.codegen.wholeStage", "false")
      s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      run(s2)
    })) {
      assert(r(0).getSeq[Long](0) == bruteHashes("abcdef", 3))
      assert(r(1).getSeq[Long](0).isEmpty)
      assert(r(2).isNullAt(0))
    }
  }

  test("utf8_scrub: valid text passes through, JDK-replacement cross-check") {
    val samples = Seq("plain ascii", "caf\u00e9 \u20ac", "\u65e5\u672c\u8a9e",
      new String(Character.toChars(0x1F600)), "")
    val rows = samples.map(_.getBytes("UTF-8"))
    val got = rows.toDF("b")
      .select(graft.plans.Utf8Scrub(col("b")).as("r"))
      .select("r.repaired", "r.n_invalid", "r.n_chars").collect()
    samples.zip(got).foreach { case (s, r) =>
      assert(r.getString(0) == s)
      assert(r.getInt(1) == 0)
      assert(r.getInt(2) == s.codePointCount(0, s.length))
    }
  }

  test("utf8_scrub: maximal-subpart replacement matches Unicode table 3-8") {
    // 61 F1 80 80 E1 80 C2 62 -> a FFFD FFFD FFFD b (TUS 3.9 example)
    def scrub(bytes: Array[Byte]) = {
      val r = Seq(bytes).toDF("b")
        .select(graft.plans.Utf8Scrub(col("b")).as("r"))
        .select("r.repaired", "r.n_invalid", "r.n_chars").head()
      (r.getString(0), r.getInt(1), r.getInt(2))
    }
    val tus = Array(0x61, 0xF1, 0x80, 0x80, 0xE1, 0x80, 0xC2, 0x62)
      .map(_.toByte)
    assert(scrub(tus) == ("a\uFFFD\uFFFD\uFFFDb", 3, 5))
    // overlong NUL C0 80: two invalid singles
    assert(scrub(Array(0xC0, 0x80).map(_.toByte)) == ("\uFFFD\uFFFD", 2, 2))
    // surrogate ED A0 80: ED's window excludes A0 -> three singles
    assert(scrub(Array(0xED, 0xA0, 0x80).map(_.toByte)) ==
      ("\uFFFD\uFFFD\uFFFD", 3, 3))
    // beyond U+10FFFF F4 90 80 80 -> four singles
    assert(scrub(Array(0xF4, 0x90, 0x80, 0x80).map(_.toByte)) ==
      ("\uFFFD" * 4, 4, 4))
    // truncated 3-byte lead at end of input: one subpart
    assert(scrub(Array(0x61, 0xE1, 0x80).map(_.toByte)) == ("a\uFFFD", 1, 2))
    // E0 9F 80 is an overlong 3-byte form: E0's window starts at A0
    assert(scrub(Array(0xE0, 0x9F, 0x80).map(_.toByte)) ==
      ("\uFFFD\uFFFD\uFFFD", 3, 3))
    // interpreted path agrees
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val r2 = Seq(tus).toDF("b")
      .select(graft.plans.Utf8Scrub(col("b")).as("r"))
      .select("r.repaired", "r.n_invalid").head()
    assert(r2.getString(0) == "a\uFFFD\uFFFD\uFFFDb" && r2.getInt(1) == 3)
    // null propagates
    val rn = Seq(Option.empty[Array[Byte]]).toDF("b")
      .select(graft.plans.Utf8Scrub(col("b")).as("r")).head()
    assert(rn.isNullAt(0))
  }

  test("nfc_normalize composes combining sequences; normalized text passes through") {
    val decomposed = "Cafe\u0301 A\u030A \u1E0B\u0323" // é, Å, d-dot-below+above
    val composed = java.text.Normalizer
      .normalize(decomposed, java.text.Normalizer.Form.NFC)
    assert(composed != decomposed) // the fixture genuinely decomposes
    val rows = Seq(decomposed, composed, "plain", "")
    val got = rows.toDF("s")
      .select(graft.plans.NfcNormalize(col("s")).as("n")).as[String].collect()
    assert(got(0) == composed)
    assert(got(1) == composed) // idempotent
    assert(got(2) == "plain" && got(3) == "")
    // interpreted path agrees; null propagates
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val r2 = Seq(Some(decomposed), None).toDF("s")
      .select(graft.plans.NfcNormalize(col("s")).as("n")).collect()
    assert(r2(0).getString(0) == composed && r2(1).isNullAt(0))
  }

  test("percent_normalize: unreserved escapes decode, reserved uppercase") {
    val cases = Seq(
      ("http://ex.org/%7Euser", "http://ex.org/~user"),
      ("http://ex.org/%7euser", "http://ex.org/~user"),
      ("/a%41%2d%5F.", "/aA-_."), // ALPHA, '-', '_' decode
      ("/q%3fx%3D1%2fz", "/q%3Fx%3D1%2Fz"), // reserved: uppercase only
      ("/ok%G1%4", "/ok%G1%4"), // invalid escapes pass through
      ("/plain", "/plain"), ("", ""))
    val got = cases.map(_._1).toDF("u")
      .select(graft.plans.PercentNormalize(col("u")).as("n"))
      .as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
    // interpreted path + null
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val r2 = Seq(Some("/x%2f%61"), None).toDF("u")
      .select(graft.plans.PercentNormalize(col("u")).as("n")).collect()
    assert(r2(0).getString(0) == "/x%2Fa" && r2(1).isNullAt(0))
  }

  test("rolling-hash substring dedup finds the collision-free route's shared windows") {
    // the scale path (q121's bench variant) must mark the same per-doc
    // duplicated-window counts as a collision-free reference keyed by the
    // FULL md5 digest. (q121's oracle form truncates md5 to 32 bits — at
    // 150k windows that produced 2 observed birthday-collision false
    // "shared" windows, identical in both engines so the oracle still
    // matches; the 64-bit rolling hash has ~none, so the reference here
    // must not truncate.)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def dupCounts(grams: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] = {
      val shared = grams.groupBy("gh")
        .agg(countDistinct("doc_id").as("nd")).filter(col("nd") >= 2)
        .select(col("gh"), lit(1).as("is_shared"))
      grams.join(shared, Seq("gh"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_win"), count(col("is_shared")).as("n_dup"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    }
    val base = docs.filter(length(col("text")) >= 20)
    val viaMd5 = dupCounts(base.select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 19), i -> substring(text, i, 20))")).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh")))
    val viaRolling = dupCounts(base.select(col("doc_id"),
      explode(graft.plans.RollingWindowHashes(col("text"), 20)).as("gh")))
    assert(viaRolling == viaMd5)
  }

  test("SimHash64 is bit-identical to the explode/groupBy relational chain") {
    import graft.functions.HashFunctions
    // the OLD simhash64Table pipeline, inlined as the reference
    def relational(docs: org.apache.spark.sql.DataFrame, k: Int) = {
      val exploded = docs
        .filter(size(split(col("text"), " ")) >= k)
        .select(col("doc_id"),
          explode(graft.operators.Dedup.wordShingles(col("text"), k)).as("sh"))
        .select(col("doc_id"),
          HashFunctions.hash32At(col("sh"), 1).as("h_lo"),
          HashFunctions.hash32At(col("sh"), 9).as("h_hi"))
      def bitCounts(h: String, prefix: String, n: Int) = (0 until n).map { b =>
        sum(when((shiftright(col(h), b) % 2) === 1, 1).otherwise(-1)).as(s"$prefix$b")
      }
      def packed(prefix: String, shiftBase: Int, n: Int) = (0 until n).map { b =>
        when(col(s"$prefix$b") > 0, lit(1L << (b + shiftBase))).otherwise(lit(0L))
      }.reduce(_ + _)
      val aggs = bitCounts("h_lo", "lo", 32) ++ bitCounts("h_hi", "hi", 31)
      exploded.groupBy("doc_id")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("doc_id"), (packed("lo", 0, 32) + packed("hi", 32, 31)).as("sim64"))
    }
    val fixture = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (100001L, "a b c a b c a b c"), // repeated shingles: distinct votes once
      (100002L, "x  y z"), // consecutive spaces: empty token kept
      (100003L, "one two three"), // exactly k tokens (k=3): one shingle
      (100004L, "häßlich übel ärger Ω µ"), // non-ASCII md5 bytes
      (100005L, "trailing space "), // trailing empty token kept
      (100006L, "a b")) // < k tokens: excluded by the caller filter
      .toDF("doc_id", "text")
    for (k <- Seq(2, 3)) {
      val docs = fixture.unionByName(edge)
      val ref = relational(docs, k)
      val got = docs.filter(size(split(col("text"), " ")) >= k)
        .select(col("doc_id"), graft.plans.SimHash64(col("text"), k).as("sim64"))
      assert(ref.count() == got.count(), s"row count at k=$k")
      assert(ref.join(got, Seq("doc_id"))
        .filter(ref("sim64") =!= got("sim64")).count() == 0,
        s"signature mismatch at k=$k")
    }
    // < k tokens yields NULL from the expression (callers filter first)
    val short = Seq(Tuple1("a b")).toDF("text")
      .select(graft.plans.SimHash64(col("text"), 3).as("s")).head()
    assert(short.isNullAt(0))
    // interpreted path agrees with codegen
    val viaDf = Seq(Tuple1("the quick brown fox")).toDF("text")
      .select(graft.plans.SimHash64(col("text"), 2)).head().getLong(0)
    val interpreted = graft.plans.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "the quick brown fox",
        org.apache.spark.sql.types.StringType), 2)
      .eval(null).asInstanceOf[Long]
    assert(viaDf == interpreted)
  }

  test("HashedShingles equals the sort_array/array_distinct/transform chain") {
    import graft.functions.HashFunctions
    // the OLD Dedup.hashedShingles chain, inlined as the reference
    def relational(text: Column, k: Int, sep: String): Column = {
      val ts = split(text, " ")
      val shingles = array_distinct(
        transform(sequence(lit(1), size(ts) - (k - 1)),
          i => concat_ws(sep, slice(ts, i, lit(k)))))
      sort_array(array_distinct(transform(shingles, HashFunctions.hash32 _)))
    }
    val fixture = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (200001L, "a b c a b c a b c"), // repeated shingles collapse
      (200002L, "x  y z"), // consecutive spaces: empty token kept
      (200003L, "one two three"), // exactly k tokens at k=3
      (200004L, "häßlich übel ärger Ω µ"), // non-ASCII md5 bytes
      (200005L, "trailing space ")) // trailing empty token kept
      .toDF("doc_id", "text")
    for ((k, sep) <- Seq((3, ' '), (2, ' '), (3, '_'))) {
      val docs = fixture.unionByName(edge)
        .filter(size(split(col("text"), " ")) >= k)
      val cmp = docs.select(
        relational(col("text"), k, sep.toString).as("ref"),
        graft.plans.HashedShingles(col("text"), k, sep).as("fast"))
      assert(cmp.filter(not(col("ref") <=> col("fast"))).count() == 0,
        s"shingle-set mismatch at k=$k sep='$sep'")
    }
    // < k tokens yields NULL (the old chain threw on slice; callers filter)
    val short = Seq(Tuple1("a b")).toDF("text")
      .select(graft.plans.HashedShingles(col("text"), 3, ' ').as("s")).head()
    assert(short.isNullAt(0))
    // interpreted path agrees with codegen
    val viaDf = Seq(Tuple1("the quick brown fox")).toDF("text")
      .select(graft.plans.HashedShingles(col("text"), 2, ' ')).head()
      .getSeq[Long](0)
    val interpreted = graft.plans.HashedShingles(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "the quick brown fox",
        org.apache.spark.sql.types.StringType), 2, ' ')
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(viaDf == interpreted)
  }

  test("WordGrams equals the transform/sequence concat idiom") {
    // the relational idiom the text-statistics queries used (multiplicity
    // and order preserved, no distinct, no hashing)
    def relational(k: Int, sep: String): Column = {
      val ws = split(col("text"), " ")
      transform(sequence(lit(0), size(ws) - k),
        i => concat_ws(sep, (0 until k).map(j => element_at(ws, i + j + 1)): _*))
    }
    val fixture = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (300001L, "a b c a b c"), // repeated grams KEPT (multiplicity)
      (300002L, "x  y z"), // consecutive spaces: empty token kept
      (300003L, "one two"), // exactly k tokens at k=2
      (300004L, "häßlich übel ärger Ω µ"), // non-ASCII
      (300005L, "trailing space ")) // trailing empty token kept
      .toDF("doc_id", "text")
    for ((k, sep) <- Seq((2, ' '), (3, '_'), (5, ' '), (6, ' '))) {
      val docs = fixture.unionByName(edge)
        .filter(size(split(col("text"), " ")) >= k)
      val cmp = docs.select(
        relational(k, sep.toString).as("ref"),
        graft.plans.WordGrams(col("text"), k, sep).as("fast"))
      assert(cmp.filter(not(col("ref") <=> col("fast"))).count() == 0,
        s"gram mismatch at k=$k sep='$sep'")
    }
    // < k tokens yields NULL (callers filter first)
    assert(Seq(Tuple1("a b")).toDF("text")
      .select(graft.plans.WordGrams(col("text"), 3, ' ')).head().isNullAt(0))
    // interpreted path agrees with codegen
    val viaDf = Seq(Tuple1("the quick brown fox")).toDF("text")
      .select(graft.plans.WordGrams(col("text"), 2, ' ')).head()
      .getSeq[String](0)
    val interp = graft.plans.WordGrams(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "the quick brown fox",
        org.apache.spark.sql.types.StringType), 2, ' ')
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(viaDf == interp)
  }

  test("MinhashFamily equals the 8 array_min(transform(...)) members") {
    import graft.functions.HashFunctions
    val refCols = HashFunctions.MinhashParams.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"),
        h => pmod(lit(a) * h + lit(b), lit(HashFunctions.Prime)))).as(s"ref_$i")
    }
    val rows = Seq.fill(200)(
      Tuple1(Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong() & 0xffffffffL)))
    val df = rows.toDF("hs")
      .select(col("hs"), graft.plans.MinhashFamily(col("hs")).as("mh"))
      .select((col("mh") +: refCols): _*)
    val bad = HashFunctions.MinhashParams.indices.map(i =>
      not(col("mh").getItem(i) <=> col(s"ref_$i"))).reduce(_ || _)
    assert(df.filter(bad).count() == 0)
    // empty array: every member is null (array_min of empty is null)
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(graft.plans.MinhashFamily(col("hs")).as("mh")).head()
    assert(empty.getSeq[java.lang.Long](0) ==
      Seq.fill[java.lang.Long](HashFunctions.MinhashParams.size)(null))
    // null input: null result; interpreted path agrees with codegen
    val nul = Seq(Tuple1(null: Seq[java.lang.Long])).toDF("hs")
      .select(graft.plans.MinhashFamily(col("hs")).as("mh")).head()
    assert(nul.isNullAt(0))
    val interp = graft.plans.MinhashFamily(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(7L, 11L, 123456789L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    val viaDf = Seq(Tuple1(Seq(7L, 11L, 123456789L))).toDF("hs")
      .select(graft.plans.MinhashFamily(col("hs"))).head().getSeq[Long](0)
    assert(interp == viaDf)
  }

  test("installInto registers the native functions for SQL on an existing session") {
    GraftExtensions.installInto(spark)
    try {
      val r = spark.sql(
        """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS c,
          |       rolling_window_hashes('abcdef', 3) AS h
          |""".stripMargin).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getInt(1) == 2)
      assert(r.getSeq[Long](2).size == 4)
      // the r16-registered trio: window extraction, winnowing, sliding min
      val r2 = spark.sql(
        """SELECT window_substrings('abcdef', 3) AS w,
          |       winnow_fingerprints('the quick brown fox jumps over it', 4) AS f,
          |       sliding_min(array(5L, 3L, 9L, 1L), 2) AS m
          |""".stripMargin).head()
      assert(r2.getSeq[String](0) == Seq("abc", "bcd", "cde", "def"))
      assert(r2.getSeq[Long](1).nonEmpty) // winnowing selects >= 1 fingerprint
      assert(r2.getSeq[Long](2) == Seq(3L, 3L, 1L))
      // simhash64 via SQL equals the Column API
      val viaSql = spark.sql(
        "SELECT simhash64('the quick brown fox', 2) AS s").head().getLong(0)
      val viaCol = Seq(Tuple1("the quick brown fox")).toDF("text")
        .select(graft.plans.SimHash64(col("text"), 2)).head().getLong(0)
      assert(viaSql == viaCol)
      // the r16 minhash-surface pair: hashed_shingles + minhash_family
      val r3 = spark.sql(
        """SELECT hashed_shingles('a b c d', 2) AS hs,
          |       hashed_shingles('a b c d', 2, '_') AS hu,
          |       minhash_family(hashed_shingles('a b c d', 2)) AS mh
          |""".stripMargin).head()
      val hsCol = Seq(Tuple1("a b c d")).toDF("text")
        .select(graft.plans.HashedShingles(col("text"), 2, ' ')).head()
        .getSeq[Long](0)
      assert(r3.getSeq[Long](0) == hsCol)
      assert(r3.getSeq[Long](1) != hsCol) // '_' joins hash differently
      assert(r3.getSeq[Long](2).size == graft.plans.MinhashFamily.Size)
      // constant expressions fold into the window (length('xx') = 2) —
      // same contract as a bare literal
      assert(spark.sql("SELECT window_substrings('abc', length('xx')) AS w")
        .head().getSeq[String](0) == Seq("ab", "bc"))
      // a genuinely non-constant window (a column) must fail LOUDLY at
      // registration dispatch — never a silently wrong window
      intercept[Exception](
        spark.sql("SELECT window_substrings('abc', CAST(id AS INT)) FROM range(1)")
          .head())
    } finally {
      // the session is shared across suites: leave no optimizer rule behind
      // (sibling specs assert rewrite-free plan shapes)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.BucketedRangeJoinRule)
    }
  }
}
