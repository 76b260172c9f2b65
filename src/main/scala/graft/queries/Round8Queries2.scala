package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.operators.{JpegCodec, Multimodal, TextAnalysis}

/** Round-8 surface, second tranche: the web-crawl curation front door —
  * HTML main-content extraction and URL canonicalization (the two
  * operators that run before ANY text operator sees a crawled page) —
  * plus the progressive-JPEG roundtrip that closes the media family.
  */
object Round8Queries2 {

  private def srcCols(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("text"),
      octet_length(col("text")).cast("int").as("n"),
      pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))

  /** HTML boilerplate strip: each document is wrapped in a realistic page
    * (head with style + script, nav, content div, aside, footer — all
    * varying per doc), then
    * [[graft.operators.TextAnalysis.stripHtmlBoilerplate]] extracts the
    * main content. The oracle predicts the CLEAN TEXT from first
    * principles — title + body text, whitespace-collapsed — without ever
    * running the strip chain, so a block pattern that over- or
    * under-matches, a tag regex eating text, or a collapse slip all land
    * in the md5/length comparison. boilerplate_ppm is the Gopher-style
    * markup-fraction signal a crawl pipeline filters on.
    */
  val q212HtmlStrip: QueryDef = QueryDef(
    "q212_html_strip",
    (s, dir) => {
      val d = srcCols(Tables.load(s, dir, "documents"))
      // Tag case varies on purpose — <STYLE>, <SCRIPT>…</SCRIPT>, <Nav>,
      // and a close tag with trailing whitespace (</aside >): all legal
      // HTML a real crawl carries, all must still strip as blocks.
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><STYLE type=\"text/css\">p{margin:"), col("v"),
        lit("px}</style><SCRIPT>track("), col("n"),
        lit(");</SCRIPT></head><body><Nav><a href=\"/\">home</a> <a href=\"/a\">about</a></Nav><div class=\"content\"><p>"),
        col("text"),
        lit("</p></div><aside>related "), col("v"),
        lit("</aside ><footer>&copy; site "), col("n"),
        lit("</footer></body></html>"))
      val clean = TextAnalysis.stripHtmlBoilerplate(html)
      d.select(col("doc_id"),
          length(html).cast("long").as("raw_len"),
          length(clean).cast("long").as("clean_len"),
          md5(clean.cast("binary")).as("clean_md5"),
          ((length(html) - length(clean)).cast("long") * 1000000L /
            length(html).cast("long")).cast("long").as("boilerplate_ppm"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, text,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      h AS (SELECT doc_id,
                   '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
                   '</title><STYLE type="text/css">p{margin:' || CAST(v AS VARCHAR) ||
                   'px}</style><SCRIPT>track(' || CAST(n AS VARCHAR) ||
                   ');</SCRIPT></head><body><Nav><a href="/">home</a> <a href="/a">about</a></Nav><div class="content"><p>' ||
                   text ||
                   '</p></div><aside>related ' || CAST(v AS VARCHAR) ||
                   '</aside ><footer>&copy; site ' || CAST(n AS VARCHAR) ||
                   '</footer></body></html>' AS html,
                   trim(regexp_replace('Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text,
                     '\s+', ' ', 'g')) AS clean
            FROM d)
      SELECT doc_id,
             CAST(length(html) AS BIGINT) AS raw_len,
             CAST(length(clean) AS BIGINT) AS clean_len,
             md5(clean) AS clean_md5,
             CAST((length(html) - length(clean)) * 1000000 // length(html)
               AS BIGINT) AS boilerplate_ppm
      FROM h ORDER BY doc_id"""))

  /** URL canonicalization + dedup: each document mints a messy-but-valid
    * URL (mixed-case scheme and host, www prefix, an explicit :443 on
    * some, a trailing path slash on some, utm_* params in first/middle/
    * last positions, an occasional fragment), then
    * [[graft.operators.TextAnalysis.canonicalizeUrl]] folds the noise and
    * the query groups by the canonical form — the URL-dedup step of a
    * crawl frontier. The oracle writes the CANONICAL URL in closed form
    * (string arithmetic only, no regex), so every normalization —
    * case-fold scope, port and www and fragment drops, utm removal with
    * separator healing, slash strip — is independently checked.
    */
  val q213UrlCanon: QueryDef = QueryDef(
    "q213_url_canon",
    (s, dir) => {
      val d = srcCols(Tables.load(s, dir, "documents"))
      val url = concat(
        when(col("n") % 2 === 0, "HTTPS").otherwise("https"),
        lit("://WWW.Site"), pmod(col("v"), lit(20)), lit(".Example.COM"),
        when(col("n") % 3 === 0, ":443").otherwise(""),
        // every 7th doc mints a PATH-LESS URL — the query string attaches
        // directly to the host, so host extraction must stop at '?'
        when(col("n") % 7 === 0, "")
          .otherwise(concat(lit("/p/"), pmod(col("doc_id"), lit(97)),
            when(col("n") % 2 === 0, "/").otherwise(""))),
        lit("?q="), pmod(col("v"), lit(7)),
        lit("&utm_source=feed"),
        when(col("n") % 5 === 0, "&utm_medium=rss").otherwise(""),
        when(col("n") % 4 === 0, concat(lit("&ref="), pmod(col("n"), lit(13))))
          .otherwise(""),
        when(col("n") % 6 === 0, concat(lit("#sec"), pmod(col("doc_id"), lit(5))))
          .otherwise(""))
      d.groupBy(TextAnalysis.canonicalizeUrl(url).as("canon_url"))
        .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("min_doc"))
        .orderBy("canon_url")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      c AS (SELECT doc_id,
                   'https://site' || CAST(v % 20 AS VARCHAR) || '.example.com' ||
                   CASE WHEN n % 7 = 0 THEN ''
                        ELSE '/p/' || CAST(doc_id % 97 AS VARCHAR) END ||
                   '?q=' || CAST(v % 7 AS VARCHAR) ||
                   CASE WHEN n % 4 = 0 THEN '&ref=' || CAST(n % 13 AS VARCHAR)
                        ELSE '' END AS canon_url
            FROM d)
      SELECT canon_url, CAST(count(*) AS BIGINT) AS n_urls,
             CAST(min(doc_id) AS BIGINT) AS min_doc
      FROM c GROUP BY canon_url ORDER BY canon_url"""))

  /** PROGRESSIVE JPEG roundtrip — the other half of the format a real
    * image lake holds (most large web JPEGs are progressive): per
    * document, encode an SOF2 stream through the full default scan script
    * ([[JpegCodec.progressiveScript]]: interleaved DC first with a point
    * transform, split-band AC firsts, DC + AC refinement scans with EOB
    * runs and correction bits), alternating 4:4:4/4:2:0 by doc, then
    * REALLY decode it ([[JpegCodec.decodeJpeg]]'s SOF2 path: per-scan
    * coefficient accumulation → dequant → IDCT) and emit the q204 pixel
    * statistics against the SAME closed-form oracle — flat blocks make
    * the multi-scan lossy pipeline exact, so a wrong refinement bit, a
    * broken EOB run, or a mis-walked scan grid all land in the hash.
    */
  val q214ProgressiveJpeg: QueryDef = QueryDef(
    "q214_progressive_jpeg",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val media = src.map { r =>
        val w = 16 * (1 + r.n % 2)
        val h = 16 * (1 + (r.n / 7) % 2)
        def dcOnly(value: Int) = { val a = new Array[Int](64); a(0) = value - 128; a }
        val bytes = JpegCodec.encodeJpegProgressive(w, h, nComp = 3,
          subsample420 = r.n % 3 == 0,
          JpegCodec.FlatQuant, JpegCodec.FlatQuant,
          (ci, _, by) => if (ci == 0) dcOnly(r.v + by) else dcOnly(128))
        Multimodal.MediaRow(r.doc_id, bytes,
          Multimodal.MediaMeta("jpeg", bytes.length, 0L))
      }
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          element_at(col("features"), 1).cast("long").as("top_r"),
          element_at(col("features"), 2).cast("long").as("top_g"),
          element_at(col("features"), 3).cast("long").as("top_b"),
          element_at(col("features"), 4).cast("long").as("wsum_r"),
          element_at(col("features"), 5).cast("long").as("wsum_g"),
          element_at(col("features"), 6).cast("long").as("wsum_b"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, v,
                   16 * (1 + n % 2) AS w,
                   16 * (1 + (n // 7) % 2) AS h
            FROM d)
      SELECT doc_id, w AS width, h AS height, 3 AS channels,
             CAST(v AS BIGINT) AS top_r,
             CAST(v AS BIGINT) AS top_g,
             CAST(v AS BIGINT) AS top_b,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + y // 8)))
               AS BIGINT) AS wsum_r,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + y // 8)))
               AS BIGINT) AS wsum_g,
             CAST(w * list_sum(list_transform(range(h), y -> (y + 1) * (v + y // 8)))
               AS BIGINT) AS wsum_b
      FROM g ORDER BY doc_id"""))

  /** DUPLICATE-SPAN REMOVAL PLAN, keep-first policy — the operation
    * corpus-level exact substring dedup actually performs on LM training
    * data (flagging, as q121/q135 do, is the diagnostic; REMOVING all but
    * the first occurrence is the treatment): every stride-1 20-char
    * window is hashed in one codegen'd Rabin–Karp pass
    * ([[graft.plans.RollingWindowHashes]]), the corpus-wide FIRST
    * occurrence of each window — min (doc_id, pos), a total order — is
    * exempted, and every other occurrence marks its [pos, pos+20) span
    * for removal. Overlapping spans within a doc merge by the sorted
    * lead-difference identity (contribution = min(next−pos, 20); last
    * span contributes 20), so `chars_removed` is the exact merged
    * coverage without materializing per-character rows — one doc-keyed
    * window over the REMOVABLE positions only, never over the corpus.
    * The oracle reproduces the wrapping-64-bit hash (q135's HUGEINT
    * protocol), the lexicographic first-occurrence, and the interval
    * merge independently.
    */
  val q215DupSpanRemoval: QueryDef = QueryDef(
    "q215_dup_span_removal",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val L = 20
      val docs = Tables.load(s, dir, "documents").filter(length(col("text")) >= L)
      val wins = docs
        .select(col("doc_id"),
          posexplode(graft.plans.RollingWindowHashes(col("text"), L)).as(Seq("pos", "gh")))
        .transform(graft.operators.ScopedCache.cache)
      val firsts = wins.groupBy("gh")
        .agg(min(struct(col("doc_id"), col("pos"))).as("f"), count(lit(1)).as("occ"))
        .filter(col("occ") >= 2)
        .select(col("gh"), col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
      val removable = wins.join(firsts, "gh")
        .filter(!(col("doc_id") === col("f_doc") && col("pos") === col("f_pos")))
        .select("doc_id", "pos")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val cov = removable
        .withColumn("nxt", lead(col("pos"), 1).over(w))
        .withColumn("contrib",
          when(col("nxt").isNull, lit(L)).otherwise(least(col("nxt") - col("pos"), lit(L))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_removed_windows"),
          sum(col("contrib")).cast("long").as("chars_removed"))
      docs.select(col("doc_id"), length(col("text")).cast("long").as("doc_len"))
        .join(cov, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("doc_len"),
          coalesce(col("n_removed_windows"), lit(0L)).as("n_removed_windows"),
          coalesce(col("chars_removed"), lit(0L)).as("chars_removed"))
        .withColumn("keep_ppm",
          expr("(doc_len - chars_removed) * 1000000 div doc_len"))
        .orderBy("doc_id")
    },
    Some("""
      WITH pos AS (
        SELECT doc_id, text, unnest(generate_series(1, len(text) - 19)) AS i
        FROM documents WHERE len(text) >= 20),
      raw AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, list_reduce(
                 list_transform(string_split(substr(text, i, 20), ''),
                                c -> CAST(ascii(c) AS HUGEINT)),
                 (acc, c) -> (acc * 1000003 + c)
                   % CAST(18446744073709551616 AS HUGEINT)) AS h
        FROM pos),
      grams AS (
        SELECT doc_id, pos,
               CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
                         THEN h - CAST(18446744073709551616 AS HUGEINT)
                         ELSE h END AS BIGINT) AS gh
        FROM raw),
      firsts AS (
        SELECT gh, min([doc_id, pos]) AS f
        FROM grams GROUP BY gh HAVING count(*) >= 2),
      removable AS (
        SELECT g.doc_id, g.pos
        FROM grams g JOIN firsts ON g.gh = firsts.gh
        WHERE NOT (g.doc_id = f[1] AND g.pos = f[2])),
      cov AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed_windows,
               CAST(sum(CASE WHEN nxt IS NULL THEN 20
                             ELSE least(nxt - pos, 20) END) AS BIGINT) AS chars_removed
        FROM (SELECT doc_id, pos,
                     lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
              FROM removable)
        GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS doc_len,
             coalesce(n_removed_windows, 0) AS n_removed_windows,
             coalesce(chars_removed, 0) AS chars_removed,
             (len(d.text) - coalesce(chars_removed, 0)) * 1000000 // len(d.text)
               AS keep_ppm
      FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
      WHERE len(d.text) >= 20
      ORDER BY d.doc_id"""))

  val all: Seq[QueryDef] = Seq(
    q212HtmlStrip, q213UrlCanon, q214ProgressiveJpeg, q215DupSpanRemoval)
}
