package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 surface: the Iceberg metadata layer (manifest-list →
  * manifest → data-file replay over the nested Avro reader) and the
  * trained-BPE token accounting, each under the synth → probe →
  * closed-form-oracle protocol.
  */
object Round11Queries {

  /** ICEBERG MANIFEST REPLAY under the oracle gate — the second
    * dominant lakehouse table format beside the delta-style JSON log
    * (q262): per document, a REAL two-layer snapshot is synthesized —
    * two manifest Avro OCFs (nested `manifest_entry` records: status,
    * optional snapshot id, the `data_file` record with a partition
    * tuple) and the manifest-list OCF pointing at them (true byte
    * lengths, true added/existing/deleted file+row counts, partition
    * bound summaries) — then replayed by
    * [[graft.operators.IcebergManifests.replay]]: the nested Avro
    * decode ([[graft.operators.AvroOcf.probeNested]]), the spec's
    * redundant MANIFEST ARITHMETIC enforced (lengths, per-status file
    * counts, per-status row sums — any drift declines), and the
    * live/deleted fold (live = EXISTING + ADDED; DELETED reported,
    * never counted). Codec rotates per document across all three
    * (`null`/`deflate`/`snappy`), so the oracle is codec-blind by
    * construction. The oracle recomputes every aggregate of the live
    * set in closed form, so a status misread, a skipped manifest, or a
    * count that silently "fixed itself" lands in the hash.
    */
  val q274IcebergManifests: QueryDef = QueryDef(
    "q274_iceberg_manifests",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import graft.operators.AvroOcf.{TInt, TRecord}
        import graft.operators.IcebergManifests
        import graft.operators.IcebergManifests._
        val partType = TRecord("r102", Vector("bucket" -> TInt))
        rows.map { r =>
          val codec = Seq("null", "deflate", "snappy")(r.v % 3)
          val k0 = 3 + r.n % 4
          val k1 = 2 + r.v % 4
          // manifest 0: the snapshot's fresh files, all ADDED
          val m0e = (0 until k0).map { i =>
            ManifestEntry(1, if (i % 2 == 0) Some(9000L + i) else None,
              DataFile(0, s"data/m0/f$i.parquet", "PARQUET",
                Vector("bucket" -> ((r.v + i) % 4).toLong),
                100L + (r.n + i) % 50,
                1000L + (r.v * 7 + i * 13) % 500))
          }
          // manifest 1: carried-over history — existing/added/deleted mix
          val m1e = (0 until k1).map { j =>
            ManifestEntry(Seq(2, 1, 0)(j % 3), None,
              DataFile(0, s"data/m1/f$j.parquet", "PARQUET",
                Vector("bucket" -> ((r.n + j) % 4).toLong),
                100L + (r.v + j) % 50,
                1000L + (r.n * 5 + j * 11) % 500))
          }
          val m0 = synthManifest(m0e, partType, codec, (r.v % 100) + 1)
          val m1 = synthManifest(m1e, partType, codec, (r.n % 100) + 2)
          def mf(path: String, bytes: Array[Byte],
              es: Seq[ManifestEntry]): ManifestFile = {
            def c(st: Int) = es.count(_.status == st)
            def rc(st: Int) =
              es.filter(_.status == st).map(_.dataFile.recordCount).sum
            val buckets = es.map(_.dataFile.partition.head._2)
            ManifestFile(path, bytes.length.toLong, 0, 9001L,
              c(1), c(0), c(2), rc(1), rc(0), rc(2),
              Some(Vector(FieldSummary(containsNull = false,
                Some(buckets.min.toString), Some(buckets.max.toString)))))
          }
          val list = synthManifestList(
            Seq(mf("meta/m0.avro", m0, m0e), mf("meta/m1.avro", m1, m1e)),
            codec, (r.v % 50) + 3)
          val lookup = Map("meta/m0.avro" -> m0, "meta/m1.avro" -> m1)
          val st = IcebergManifests.replay(list, lookup.get)
            .getOrElse(sys.error(s"iceberg replay failed: doc ${r.doc_id}"))
          val livePaths = st.live.map(_.path)
          (r.doc_id, codec, st.nManifests, st.live.size, st.deleted.size,
            st.liveRows, st.liveBytes,
            st.live.map(_.partition.head._2).distinct.size,
            livePaths.max,
            st.deleted.map(_.recordCount).sum)
        }
      }
      probed.toDF("doc_id", "codec", "n_manifests", "live_files",
          "deleted_files", "live_rows", "live_bytes", "live_buckets",
          "last_live_path", "deleted_rows")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   3 + n % 4 AS k0,
                   2 + v % 4 AS k1
            FROM d),
      t AS (SELECT *,
                   list_transform(range(k1), j ->
                     ([2, 1, 0])[j % 3 + 1]) AS m1status,
                   list_transform(range(k1), j -> 100 + (v + j) % 50)
                     AS m1rows,
                   list_transform(range(k1), j ->
                     1000 + (n * 5 + j * 11) % 500) AS m1bytes,
                   list_transform(range(k1), j -> (n + j) % 4) AS m1bkt
            FROM g),
      u AS (SELECT *,
                   list_sum(list_transform(range(k0), i ->
                     100 + (n + i) % 50)) AS m0rows,
                   list_sum(list_transform(range(k0), i ->
                     1000 + (v * 7 + i * 13) % 500)) AS m0bytes,
                   list_transform(range(k0), i -> (v + i) % 4) AS m0bkt,
                   list_sum(list_transform(range(k1), j -> CASE WHEN
                     m1status[j + 1] <> 2 THEN m1rows[j + 1] ELSE 0 END))
                     AS m1liverows,
                   list_sum(list_transform(range(k1), j -> CASE WHEN
                     m1status[j + 1] <> 2 THEN m1bytes[j + 1] ELSE 0 END))
                     AS m1livebytes,
                   len(list_filter(range(k1), j -> m1status[j + 1] <> 2))
                     AS m1live,
                   list_sum(list_transform(range(k1), j -> CASE WHEN
                     m1status[j + 1] = 2 THEN m1rows[j + 1] ELSE 0 END))
                     AS m1deadrows
            FROM t)
      SELECT doc_id,
             (['null', 'deflate', 'snappy'])[v % 3 + 1] AS codec,
             CAST(2 AS INTEGER) AS n_manifests,
             CAST(k0 + m1live AS INTEGER) AS live_files,
             CAST(k1 - m1live AS INTEGER) AS deleted_files,
             CAST(m0rows + m1liverows AS BIGINT) AS live_rows,
             CAST(m0bytes + m1livebytes AS BIGINT) AS live_bytes,
             CAST(len(list_distinct(list_concat(m0bkt,
               list_transform(list_filter(range(k1), j ->
                 m1status[j + 1] <> 2), j -> m1bkt[j + 1]))))
               AS INTEGER) AS live_buckets,
             list_max(list_transform(list_filter(range(k1), j ->
               m1status[j + 1] <> 2), j ->
               'data/m1/f' || j || '.parquet')) AS last_live_path,
             CAST(m1deadrows AS BIGINT) AS deleted_rows
      FROM u ORDER BY doc_id"""))

  /** SFT TOKEN BUDGET UNDER THE TRAINED VOCABULARY — q264's truncation
    * rule re-based on REAL token counts: the budget currency there (and in
    * [[graft.operators.CorpusOps.sequencePack]]) was a whitespace/regex
    * proxy; here the corpus first trains six BPE merges
    * ([[graft.operators.TextAnalysis.bpeTrain]]), every word is segmented
    * under the induced vocabulary
    * ([[graft.operators.TextAnalysis.bpeWordTokens]] — a vocabulary-sized
    * fold, equi-joined back to occurrences), and each document becomes a
    * k-turn conversation (words dealt round-robin into turns, user and
    * assistant alternating) whose greedy keep-the-newest-whole-turns
    * truncation counts TRAINED tokens. Because token counts now require a
    * corpus join, the suffix selection runs DISTRIBUTED — a per-doc
    * descending-j running sum (partitioned window, never unpartitioned) —
    * instead of q264's per-row fold. The oracle replays the six merge
    * rounds (the shared [[BpeSql]] chain), rebuilds the same turns, and
    * recomputes the suffix-sum cut in closed form, so a drift in the
    * trained segmentation OR the budget arithmetic lands in the hash.
    */
  val q275SftBpeBudget: QueryDef = QueryDef(
    "q275_sft_bpe_budget",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.TextAnalysis
      val docs = Tables.load(s, dir, "documents")
      val merges = TextAnalysis.bpeTrain(docs, rounds = 6)
        .orderBy("round").collect().map(_.getString(1)).toSeq
      val wordTok = TextAnalysis.bpeWordTokens(docs, merges) // (w, nt)
      val g = docs.select(col("doc_id"), col("text"),
        (lit(3) + pmod(graft.functions.HashFunctions.hash32(col("text")),
          lit(200)).cast("int") % 4).as("k"),
        // budget ~half the typical doc's trained-token total, so the cut
        // lands mid-conversation (a budget far below any turn degenerates
        // to kept=0 everywhere and the oracle stops discriminating)
        (lit(40L) + floor(octet_length(col("text")).cast("int") / 2)
          + octet_length(col("text")).cast("int") % 25)
          .cast("long").as("b"))
      val occ = g.select(col("doc_id"), col("k"),
          posexplode(split(col("text"), " ")).as(Seq("i", "w")))
        .filter(col("w") =!= "")
        .withColumn("j", pmod(col("i"), col("k")))
      val tt = occ.join(wordTok, "w")
        .groupBy("doc_id", "j").agg(sum("nt").as("ttok"))
      val turns = g.select(col("doc_id"), col("b"), col("k"),
          explode(sequence(lit(0), col("k") - 1)).as("j"))
        .join(tt, Seq("doc_id", "j"), "left")
        .na.fill(0L, Seq("ttok"))
      val wSfx = Window.partitionBy("doc_id").orderBy(col("j").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val kept = col("sfx") <= col("b")
      turns.withColumn("sfx", sum("ttok").over(wSfx))
        .groupBy("doc_id")
        .agg(
          max("k").cast("int").as("n_turns"),
          max("b").as("budget"),
          count(when(kept, 1)).cast("int").as("kept_turns"),
          coalesce(sum(when(kept, col("ttok"))), lit(0L))
            .as("kept_bpe_tokens"),
          count(when(kept && col("j") % 2 === 1, 1)).cast("int")
            .as("kept_assistant_turns"),
          coalesce(sum(when(kept && col("j") % 2 === 1, col("ttok"))),
            lit(0L)).as("kept_assistant_tokens"))
        .withColumn("first_kept_role",
          when(col("kept_turns") === 0, "")
            .when((col("n_turns") - col("kept_turns")) % 2 === 0, "user")
            .otherwise("assistant"))
        .orderBy("doc_id")
    },
    Some {
      val K = 6
      s"""
      WITH ${BpeSql.words},
      ${BpeSql.chain(K)},
      nt AS (SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS nt
             FROM sym$K),
      d AS (SELECT doc_id, text,
                   3 + CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                     AS INTEGER) % 4 AS k,
                   CAST(40 + octet_length(encode(text)) // 2
                        + octet_length(encode(text)) % 25 AS BIGINT) AS b
            FROM documents),
      occ AS (SELECT doc_id, k, (u.i - 1) % k AS j, ws[u.i] AS w
              FROM (SELECT doc_id, k, string_split(text, ' ') AS ws FROM d),
                   unnest(range(1, len(ws) + 1)) AS u(i)
              WHERE ws[u.i] != ''),
      tt AS (SELECT doc_id, j, SUM(nt.nt) AS ttok
             FROM occ JOIN nt ON occ.w = nt.w GROUP BY 1, 2),
      tgrid AS (SELECT doc_id, b, k, unnest(range(k)) AS j FROM d),
      turns AS (SELECT tg.doc_id, tg.b, tg.k, tg.j,
                       coalesce(tt.ttok, 0) AS ttok
                FROM tgrid tg
                LEFT JOIN tt ON tt.doc_id = tg.doc_id AND tt.j = tg.j),
      sfx AS (SELECT *, SUM(ttok) OVER (PARTITION BY doc_id ORDER BY j DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sfx
              FROM turns),
      a AS (SELECT doc_id,
                   CAST(max(k) AS INTEGER) AS n_turns,
                   max(b) AS budget,
                   CAST(count(*) FILTER (WHERE sfx <= b) AS INTEGER)
                     AS kept_turns,
                   CAST(coalesce(SUM(ttok) FILTER (WHERE sfx <= b), 0)
                     AS BIGINT) AS kept_bpe_tokens,
                   CAST(count(*) FILTER (WHERE sfx <= b AND j % 2 = 1)
                     AS INTEGER) AS kept_assistant_turns,
                   CAST(coalesce(SUM(ttok) FILTER
                     (WHERE sfx <= b AND j % 2 = 1), 0) AS BIGINT)
                     AS kept_assistant_tokens
            FROM sfx GROUP BY doc_id)
      SELECT *,
             CASE WHEN kept_turns = 0 THEN ''
                  WHEN (n_turns - kept_turns) % 2 = 0 THEN 'user'
                  ELSE 'assistant' END AS first_kept_role
      FROM a ORDER BY doc_id"""
    })

  /** PARQUET BYTE_STREAM_SPLIT under the oracle gate — the encoding
    * parquet-format 2.8 added for floating-point compressibility
    * (value i's byte j lands in stream j; the transpose makes float
    * columns squeeze), which Spark's DataFrame writer cannot even
    * switch on: each PARTITION's documents become row spans of one
    * REAL parquet file written by PARQUET-MR ITSELF
    * ([[graft.operators.ParquetSynth.synthBss]] — the builder-only
    * `withByteStreamSplitEncoding`, dictionaries off, snappy) with
    * planted nulls in both float columns, the footer is REQUIRED to
    * declare encoding 9 on them (a silent PLAIN fallback would void
    * the probe), and [[graft.operators.ParquetPages.readColumn]]
    * decodes the streams back, sliced per doc. Values are exact
    * binary fractions (k/4, k/2), so the oracle's closed-form sums
    * are bit-exact doubles.
    */
  val q276ParquetBss: QueryDef = QueryDef(
    "q276_parquet_bss",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        // parquet-mr writer init is ~7 ms/file — 5000 docs on the scan's
        // 1-2 input partitions would serialize ~35 s of work; one narrow
        // shuffle of 3 ints/doc unlocks full-core synthesis
        .repartition(col("doc_id"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import graft.operators.{ParquetFooter, ParquetPages, ParquetSynth}
        import graft.operators.ParquetPages.{PDouble, PLong}
        import graft.operators.ParquetSynth.BssRow
        // ONE file per PARTITION, not per doc: parquet-mr writer init
        // serializes on global codec-pool/conf locks (a per-doc writer
        // measured 63 s across 32 threads vs 7 s single-threaded — the
        // contention INVERTED the parallelism), so all the partition's
        // docs become row spans of one real file, decoded once and
        // sliced back per doc. Partition-bounded memory: a few ints per
        // row, thousands of rows.
        val docs = rows.toVector
        if (docs.isEmpty) Iterator.empty
        else {
          val perDoc = docs.map { r =>
            val k = 5 + r.n % 10
            val bss = (0 until k).map { i =>
              BssRow(((r.v + i) % 50).toLong,
                if (i == 2) None else Some((r.v + i) * 0.25),
                if (i == 3) None else Some((r.n + i) * 0.5f))
            }
            (r, bss)
          }
          val bytes = ParquetSynth.synthBss(perDoc.flatMap(_._2), snappy = true)
          val f = ParquetFooter.probe(bytes)
            .getOrElse(sys.error("bss footer probe failed"))
          require(f.nRowGroups == 1, "partition file must be one row group")
          def chunk(name: String) = f.firstGroupChunks
            .find(_.pathInSchema == name)
            .getOrElse(sys.error(s"no chunk $name"))
          require(chunk("d").encodings.contains(9) &&
            chunk("f").encodings.contains(9),
            "BYTE_STREAM_SPLIT not engaged")
          require(!chunk("id").encodings.contains(9),
            "int column must stay outside the float-only BSS scope")
          def read(name: String) = ParquetPages.readColumn(bytes, chunk(name))
            .getOrElse(sys.error(s"bss decode failed: $name"))
          val ids = read("id")
          val ds = read("d")
          val fs = read("f")
          require(f.numRows == perDoc.map(_._2.length).sum.toLong,
            "row count drift")
          var off = 0
          perDoc.iterator.map { case (r, bss) =>
            val k = bss.length
            val dSlice = ds.slice(off, off + k)
            val fSlice = fs.slice(off, off + k)
            val idSlice = ids.slice(off, off + k)
            off += k
            (r.doc_id, k.toLong,
              idSlice.flatten.collect { case PLong(x) => x }.sum,
              dSlice.flatten.collect { case PDouble(x) => x }.sum,
              dSlice.count(_.isEmpty).toLong,
              fSlice.flatten.collect { case PDouble(x) => x }.sum,
              fSlice.count(_.isEmpty).toLong)
          }
        }
      }
      probed.toDF("doc_id", "n_rows", "id_sum", "d_sum",
          "d_nulls", "f_sum", "f_nulls")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 5 + n % 10 AS k FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(k), i -> (v + i) % 50))
                     AS idsum,
                   list_sum(list_transform(range(k), i ->
                     CASE WHEN i = 2 THEN 0 ELSE v + i END)) AS dsum4,
                   list_sum(list_transform(range(k), i ->
                     CASE WHEN i = 3 THEN 0 ELSE n + i END)) AS fsum2
            FROM g)
      SELECT doc_id,
             CAST(k AS BIGINT) AS n_rows,
             CAST(idsum AS BIGINT) AS id_sum,
             CAST(0.25e0 * dsum4 AS DOUBLE) AS d_sum,
             CAST(1 AS BIGINT) AS d_nulls,
             CAST(0.5e0 * fsum2 AS DOUBLE) AS f_sum,
             CAST(1 AS BIGINT) AS f_nulls
      FROM t ORDER BY doc_id"""))

  /** ARROW DICTIONARY BATCHES under the oracle gate — the remaining
    * common encoding after q261/q273's plain and compressed bodies:
    * per document, the ARROW JAVA LIBRARY writes a file whose utf8
    * column is DICTIONARY-ENCODED (a per-doc dictionary under its own
    * id, int32 indices with a planted null, delivered as a
    * DictionaryBatch the footer's dictionaries vector points at), and
    * [[graft.operators.ArrowIpc.probe]] decodes it — the dictionary
    * block walk, the value-type batch decode, and the index
    * resolution with range checks. The oracle rebuilds every resolved
    * string and aggregate in closed form, so an off-by-one in the
    * index mapping, a mis-walked dictionary block, or a dropped null
    * slot lands in the hash.
    */
  val q277ArrowDict: QueryDef = QueryDef(
    "q277_arrow_dict",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import graft.operators.{ArrowIpc, ArrowSynth}
        import graft.operators.ArrowIpc.{ALong, AStr}
        ArrowSynth.mapWithAllocator(rows) { (r, alloc) =>
          val d = 3 + r.v % 4
          val k = 6 + r.n % 8
          val dictValues = (0 until d).map(i =>
            ('a' + (r.v + i) % 26).toChar.toString * (2 + (r.n + i) % 5))
          val ids = (0 until k).map(j => ((r.v + j) % 70).toLong)
          val indices = (0 until k).map(j =>
            if (j == 1) None else Some((r.n + j) % d))
          val bytes = ArrowSynth.synthDictFile(alloc, 5L + r.v % 3,
            dictValues, ids, indices)
          val info = ArrowIpc.probe(bytes)
            .getOrElse(sys.error(s"arrow dict decode failed: doc ${r.doc_id}"))
          require(info.fields(1).dict && info.fields(1).ftype == "utf8",
            s"dict field drift: doc ${r.doc_id}")
          val colors = info.columns(1)
          require(colors(1).isEmpty, s"null slot drift: doc ${r.doc_id}")
          val resolved = colors.flatten.collect { case AStr(x) => x }
          (r.doc_id, info.nRows, d.toLong,
            info.columns(0).flatten.collect { case ALong(x) => x }.sum,
            resolved.map(_.length.toLong).sum,
            resolved.distinct.size,
            resolved.head, resolved.last)
        }
      }
      probed.toDF("doc_id", "n_rows", "dict_size", "id_sum", "color_chars",
          "distinct_colors", "first_color", "last_color")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 3 + v % 4 AS d, 6 + n % 8 AS k FROM d),
      t AS (SELECT *,
                   list_transform(list_filter(range(k), j -> j != 1),
                     j -> (n + j) % d) AS idx
            FROM g)
      SELECT doc_id,
             CAST(k AS BIGINT) AS n_rows,
             CAST(d AS BIGINT) AS dict_size,
             CAST(list_sum(list_transform(range(k), j -> (v + j) % 70))
               AS BIGINT) AS id_sum,
             CAST(list_sum(list_transform(idx, i -> 2 + (n + i) % 5))
               AS BIGINT) AS color_chars,
             CAST(len(list_distinct(idx)) AS INTEGER) AS distinct_colors,
             repeat(chr(97 + (v + (n % d)) % 26), 2 + (n + (n % d)) % 5)
               AS first_color,
             repeat(chr(97 + (v + ((n + k - 1) % d)) % 26),
               2 + (n + ((n + k - 1) % d)) % 5) AS last_color
      FROM t ORDER BY doc_id"""))

  /** ORC STRIPE-FOOTER STREAM WALK under the oracle gate — the layer
    * below q258's file tail: the per-stripe directory of physical
    * streams a column reader actually seeks to, plus the per-column
    * encodings. The documents table (with a derived 3-value `lang`
    * column, so the writer's dictionary decision deterministically
    * engages for one string column and not the near-unique `text`) is
    * written by SPARK'S OWN ORC WRITER, then
    * [[graft.operators.OrcFooter.probeStripes]] walks every stripe:
    * protobuf StripeFooter decode under the file codec's block
    * framing, streams REQUIRED to tile the stripe (index kinds sum to
    * indexLength, the rest to dataLength), encodings aligned with the
    * type tree. The oracle derives the dictionary sizes and the
    * stream census from the DATA — ndv per string column against the
    * writer's documented 0.8 `orc.dictionary.key.threshold`, DATA /
    * +LENGTH / +DICTIONARY_DATA per encoding family — so a mis-walked
    * stripe directory or a wrong encoding read lands in the hash.
    */
  val q278OrcStripes: QueryDef = QueryDef(
    "q278_orc_stripes",
    (s, dir) => {
      import s.implicits._
      graft.sources.CompressedIngest.documentsOrcLang(s, dir)
      val path = graft.sources.CompressedIngest.dumpPath(dir, "orc_lang")
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.orc").load(path)
        .select(col("content")).as[Array[Byte]]
      val perFile = files.map { bytes =>
        import graft.operators.OrcFooter
        val stripes = OrcFooter.probeStripes(bytes)
          .getOrElse(sys.error("orc stripe walk failed"))
        // schema written as (doc_id, text, lang): type-tree columns
        // 1 (long), 2 (string), 3 (string) under the root struct 0
        require(stripes.forall(_.encodings.length == 4),
          "type-tree drift")
        require(stripes.forall(st => !st.streams.exists(_.kind == 0)),
          "no nulls were written -> no PRESENT streams")
        val langDict = stripes.map(_.encodings(3))
        val textEnc = stripes.map(_.encodings(2))
        require(textEnc.forall(_.dictionarySize == 0L),
          "near-unique text must not dictionary-encode")
        val dictCols = Seq(1, 2, 3).count(c =>
          stripes.forall(st => st.encodings(c).kind == 1 ||
            st.encodings(c).kind == 3))
        val dataStreams = stripes.map(_.streams.count(!_.isIndex))
        (stripes.map(_.rows).sum,
          langDict.map(_.dictionarySize).min,
          langDict.map(_.dictionarySize).max,
          dictCols.toLong,
          dataStreams.min.toLong, dataStreams.max.toLong)
      }.toDF("rows", "ldmin", "ldmax", "dictcols", "dsmin", "dsmax")
      perFile.agg(
        sum("rows").as("n_rows"),
        min("ldmin").cast("int").as("lang_dict_min"),
        max("ldmax").cast("int").as("lang_dict_max"),
        max("dictcols").cast("int").as("dict_string_cols"),
        min("dsmin").cast("int").as("data_streams_min"),
        max("dsmax").cast("int").as("data_streams_max"))
    },
    Some("""
      WITH d AS (SELECT doc_id, text,
                        'l' || CAST(doc_id % 3 AS VARCHAR) AS lang
                 FROM documents),
      a AS (SELECT count(*) AS n,
                   count(DISTINCT lang) AS ndl,
                   count(DISTINCT text) AS ndt
            FROM d),
      -- the writer's documented dictionary rule: ndv/rows <= 0.8
      e AS (SELECT *,
                   CASE WHEN ndt <= 0.8e0 * n THEN 1 ELSE 0 END AS dict_text,
                   CASE WHEN ndl <= 0.8e0 * n THEN 1 ELSE 0 END AS dict_lang
            FROM a)
      SELECT CAST(n AS BIGINT) AS n_rows,
             CAST(ndl AS INTEGER) AS lang_dict_min,
             CAST(ndl AS INTEGER) AS lang_dict_max,
             CAST(dict_text + dict_lang AS INTEGER) AS dict_string_cols,
             -- per stripe: long = DATA; string = DATA + LENGTH
             -- (+ DICTIONARY_DATA when dictionary-encoded)
             CAST(1 + 2 + dict_text + 2 + dict_lang AS INTEGER)
               AS data_streams_min,
             CAST(1 + 2 + dict_text + 2 + dict_lang AS INTEGER)
               AS data_streams_max
      FROM e"""))

  /** ICEBERG V2 POSITIONAL DELETES under the oracle gate — the
    * merge-on-read layer above q274's v1 replay: per document, the
    * snapshot carries a DATA manifest (content 0) and a DELETES
    * manifest (content 1) whose entry is a real position-delete Avro
    * file (`file_path`, `pos` records, possibly listing the same
    * position more than once). [[graft.operators.IcebergManifests
    * .replayV2]] folds the live set, decodes the delete file, and
    * enforces the v2 rules: the delete manifest's row arithmetic
    * counts DELETE rows, every target must be a live data file, every
    * position inside its target's `record_count`, content kinds may
    * not cross manifests, and positions DEDUPLICATE per target. The
    * oracle rebuilds the distinct-position sets and the effective
    * (post-delete) row count in closed form.
    */
  val q279IcebergDeletes: QueryDef = QueryDef(
    "q279_iceberg_deletes",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import graft.operators.AvroOcf.{TInt, TRecord}
        import graft.operators.IcebergManifests
        import graft.operators.IcebergManifests._
        val partType = TRecord("r102", Vector("bucket" -> TInt))
        rows.map { r =>
          val codec = Seq("null", "deflate", "snappy")(r.v % 3)
          val k = 3 + r.n % 4
          def rc(i: Int): Long = 20L + (r.n + i) % 30
          val dataE = (0 until k).map { i =>
            ManifestEntry(1, None,
              DataFile(0, s"data/f$i.parquet", "PARQUET",
                Vector("bucket" -> ((r.v + i) % 4).toLong), rc(i),
                1000L + (r.v * 7 + i * 13) % 500))
          }
          val dm = synthManifest(dataE, partType, codec, (r.v % 90) + 1)
          // raw delete rows (duplicates allowed — replay deduplicates)
          val dels = (0 until k).filter(_ % 2 == 0).flatMap { i =>
            val dc = 1 + (r.v + i) % 3
            (0 until dc).map(t =>
              (s"data/f$i.parquet", (r.v + i + t * 7).toLong % rc(i)))
          }
          val delFile = synthPosDeletes(dels, codec, (r.n % 90) + 2)
          val delE = Seq(ManifestEntry(1, None,
            DataFile(1, "del/d0.avro", "AVRO", Vector("bucket" -> 0L),
              dels.length.toLong, delFile.length.toLong)))
          val delM = synthManifest(delE, partType, codec, (r.v % 50) + 3)
          def mf(path: String, bytes: Array[Byte],
              es: Seq[ManifestEntry], content: Int): ManifestFile =
            ManifestFile(path, bytes.length.toLong, 0, 9001L,
              es.count(_.status == 1), 0, 0,
              es.map(_.dataFile.recordCount).sum, 0L, 0L, None, content)
          val list = synthManifestList(
            Seq(mf("meta/dm.avro", dm, dataE, 0),
              mf("meta/delm.avro", delM, delE, 1)),
            codec, (r.n % 50) + 4)
          val lookup = Map("meta/dm.avro" -> dm, "meta/delm.avro" -> delM,
            "del/d0.avro" -> delFile)
          val st = IcebergManifests.replayV2(list, lookup.get)
            .getOrElse(sys.error(s"v2 replay failed: doc ${r.doc_id}"))
          val delCounts = st.deletedPositions
          (r.doc_id, codec, st.base.live.size, st.base.liveRows,
            dels.length.toLong, delCounts.values.sum, st.effectiveRows,
            delCounts.size, if (delCounts.isEmpty) 0L else delCounts.values.max)
        }
      }
      probed.toDF("doc_id", "codec", "live_files", "base_rows",
          "del_rows_raw", "deleted_positions", "effective_rows",
          "files_touched", "max_del_one_file")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 3 + n % 4 AS k FROM d),
      t AS (SELECT *,
                   list_sum(list_transform(range(k), i -> 20 + (n + i) % 30))
                     AS baserows,
                   list_filter(range(k), i -> i % 2 = 0) AS touched
            FROM g),
      u AS (SELECT *,
                   list_transform(touched, i -> 1 + (v + i) % 3) AS dcs,
                   list_transform(touched, i ->
                     len(list_distinct(list_transform(
                       range(1 + (v + i) % 3), t ->
                         (v + i + t * 7) % (20 + (n + i) % 30)))))
                     AS dels
            FROM t)
      SELECT doc_id,
             (['null', 'deflate', 'snappy'])[v % 3 + 1] AS codec,
             CAST(k AS INTEGER) AS live_files,
             CAST(baserows AS BIGINT) AS base_rows,
             CAST(list_sum(dcs) AS BIGINT) AS del_rows_raw,
             CAST(list_sum(dels) AS BIGINT) AS deleted_positions,
             CAST(baserows - list_sum(dels) AS BIGINT) AS effective_rows,
             CAST(len(touched) AS INTEGER) AS files_touched,
             CAST(list_max(dels) AS BIGINT) AS max_del_one_file
      FROM u ORDER BY doc_id"""))

  /** ICEBERG TABLE-METADATA RESOLUTION under the oracle gate — the
    * JSON layer that completes the chain (q274 manifests, q279 v2
    * deletes): per document, a real `vN.metadata.json` document
    * (Jackson-built — escaping is the library's, not string splicing)
    * lists 2–4 snapshots with ascending sequence numbers; the CURRENT
    * snapshot resolves through
    * [[graft.operators.IcebergMetadata.replayCurrent]] — metadata
    * parse (strictness: unique snapshot ids, current must exist,
    * non-decreasing sequence numbers), manifest-list decode, and the
    * full v2 fold with every manifest-arithmetic rule enforced
    * down-chain. The oracle recomputes the current snapshot's
    * parameters and live set in closed form, so resolving the WRONG
    * snapshot — or skipping the chain — lands in the hash.
    */
  val q280IcebergMetadata: QueryDef = QueryDef(
    "q280_iceberg_metadata",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(graft.functions.HashFunctions.hash32(col("text")), lit(200))
            .cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import graft.operators.AvroOcf.{TInt, TRecord}
        import graft.operators.{IcebergManifests, IcebergMetadata}
        import graft.operators.IcebergManifests._
        import graft.operators.IcebergMetadata.SnapshotRef
        val partType = TRecord("r102", Vector("bucket" -> TInt))
        rows.map { r =>
          val nSnaps = 2 + r.v % 3
          val cur = nSnaps - 1
          // only the CURRENT snapshot's manifest chain is materialized;
          // older snapshots are listed (the reader must not touch them)
          val k = 3 + (r.n + cur) % 4
          val entries = (0 until k).map { i =>
            ManifestEntry(1, None,
              DataFile(0, s"s$cur/f$i.parquet", "PARQUET",
                Vector("bucket" -> ((r.v + i) % 4).toLong),
                30L + (r.v + cur + i) % 40,
                1000L + (r.n * 3 + cur * 17 + i * 7) % 400))
          }
          val dm = synthManifest(entries, partType, "deflate",
            (r.v % 80) + 1)
          val list = synthManifestList(Seq(
            ManifestFile(s"meta/m$cur.avro", dm.length.toLong, 0,
              1000L + cur, k, 0, 0,
              entries.map(_.dataFile.recordCount).sum, 0L, 0L, None, 0)),
            "deflate", (r.n % 80) + 2)
          val snaps = (0 until nSnaps).map(si =>
            SnapshotRef(1000L + si, si + 1L, 1700000000000L + si * 1000L,
              s"meta/list$si.avro", if (si == 0) "append" else "overwrite"))
          val json = IcebergMetadata.synthMetadata(
            s"tbl-${r.v}", s"warehouse/t${r.doc_id}", snaps, 1000L + cur)
          val lookup = Map(s"meta/list$cur.avro" -> list,
            s"meta/m$cur.avro" -> dm)
          val (meta, st) = IcebergMetadata.replayCurrent(json, lookup.get)
            .getOrElse(sys.error(s"metadata replay failed: doc ${r.doc_id}"))
          val c = meta.current.get
          (r.doc_id, meta.formatVersion, meta.uuid, meta.snapshots.size,
            c.id, c.sequenceNumber, c.operation,
            st.base.live.size, st.base.liveRows, st.effectiveRows,
            st.base.live.map(_.path).max)
        }
      }
      probed.toDF("doc_id", "format_version", "uuid", "n_snapshots",
          "current_id", "current_seq", "current_op", "live_files",
          "live_rows", "effective_rows", "last_path")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200 AS INTEGER) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v,
                   2 + v % 3 AS ns,
                   (2 + v % 3) - 1 AS cur
            FROM d),
      t AS (SELECT *, 3 + (n + cur) % 4 AS k FROM g),
      u AS (SELECT *,
                   list_sum(list_transform(range(k), i ->
                     30 + (v + cur + i) % 40)) AS liverows
            FROM t)
      SELECT doc_id,
             CAST(2 AS INTEGER) AS format_version,
             'tbl-' || v AS uuid,
             CAST(ns AS INTEGER) AS n_snapshots,
             CAST(1000 + cur AS BIGINT) AS current_id,
             CAST(cur + 1 AS BIGINT) AS current_seq,
             CASE WHEN cur = 0 THEN 'append' ELSE 'overwrite' END
               AS current_op,
             CAST(k AS INTEGER) AS live_files,
             CAST(liverows AS BIGINT) AS live_rows,
             CAST(liverows AS BIGINT) AS effective_rows,
             's' || cur || '/f' || (k - 1) || '.parquet' AS last_path
      FROM u ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q274IcebergManifests, q275SftBpeBudget, q276ParquetBss,
      q277ArrowDict, q278OrcStripes, q279IcebergDeletes,
      q280IcebergMetadata)
}
