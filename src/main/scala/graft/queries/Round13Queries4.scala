package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.operators.{Dedup, DeletionVectors, MediaCodecs, Puffin}

/** Round-13 additions, fourth tranche: the Iceberg-v3 stats/DV container
  * (Puffin), audio near-dup through the real WAV codec, and the
  * fill-in-middle training transform.
  */
object Round13Queries4 {

  /** PUFFIN STATS/DV CONTAINER AT FILE GRANULARITY — Iceberg v3 scopes
    * ONE deletion vector per DATA FILE, so the group key here is a
    * synthetic file id of at most 40 rows (doc_id div 40): task memory
    * is O(file rows) no matter the corpus — the r13 verdict's fix for
    * the earlier per-bucket shape, whose task-local array grew with a
    * corpus FRACTION. Per file the query runs the WHOLE v3 chain in one
    * task: the file's deletion vector (positions ≡ 2 mod 5 of the
    * sorted rows) serializes through the spec's v3 FRAMING (BE length +
    * magic D1D33964 + portable RoaringBitmapArray + BE CRC-32,
    * [[graft.operators.DeletionVectors.serializeDvBlob]]) into a REAL
    * two-blob Puffin image (footer LZ4-frame compressed on even file
    * ids), a v3 delete manifest references the blob through
    * `referenced_data_file`/`content_offset`/`content_size_in_bytes`,
    * and [[graft.operators.IcebergManifests.replayV3]] replays
    * file→DV→Puffin→manifest end to end. The oracle pins the blob
    * geometry closed-form (offset 4; framed DV length 44 + 2·|DV|, 24
    * when the file deletes nothing — a sub-3-row tail file at tiny
    * scale factors) beside the replayed live-row arithmetic, so a
    * framing error anywhere in the chain lands in the hash.
    */
  val q340PuffinDv: QueryDef = QueryDef(
    "q340_puffin_dv",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      ids.groupByKey(_ / 40).flatMapGroups { (fid, it) =>
        import graft.operators.IcebergManifests
        import graft.operators.IcebergManifests.{DataFile, ManifestEntry, ManifestFile}
        import graft.operators.AvroOcf.{TInt, TRecord}
        val vals = it.toArray.sorted
        val del = vals.indices.collect { case p if p % 5 == 2 => p.toLong }.toArray
        val dv = DeletionVectors.serializeDvBlob(del)
        var sum = 0L
        vals.foreach(sum += _)
        val rowsum = Array.tabulate[Byte](8)(i => ((sum >>> (8 * i)) & 0xff).toByte)
        val file = Puffin.write(
          Seq("deletion-vector-v1" -> dv, "graft-rowsum-v1" -> rowsum),
          snapshotId = fid, sequenceNumber = 7L,
          properties = Map("created-by" -> "graft"),
          compressFooter = fid % 2 == 0)
        val probed = Puffin.probe(file)
          .getOrElse(sys.error(s"puffin probe failed: file $fid"))
        require(probed.properties.get("created-by").contains("graft"),
          "properties drift")
        val dvMeta = probed.blobs.find(_.blobType == "deletion-vector-v1")
          .getOrElse(sys.error("missing dv blob"))
        val sumMeta = probed.blobs.find(_.blobType == "graft-rowsum-v1")
          .getOrElse(sys.error("missing rowsum blob"))
        val positions = DeletionVectors.deserializeDvBlob(
          Puffin.blobBytes(file, dvMeta))
          .getOrElse(sys.error("dv blob did not deserialize"))
        require(java.util.Arrays.equals(positions, del), "dv roundtrip drift")
        val sb = Puffin.blobBytes(file, sumMeta)
        var got = 0L
        (0 until 8).foreach(i => got |= (sb(i) & 0xffL) << (8 * i))
        // the manifest leg: ONE data file + its DV, replayed through the
        // v3 rules (puffin footer blob == manifest offsets, cardinality
        // == record_count, positions in range, one DV per file)
        val partType = TRecord("r340", Vector("bucket" -> TInt))
        val dataPath = s"data/f$fid.parquet"
        val dataEntries = Seq(ManifestEntry(1, Some(9001L),
          DataFile(0, dataPath, "PARQUET", Vector("bucket" -> 0L),
            vals.length.toLong, 512L)))
        val dm = IcebergManifests.synthManifest(dataEntries, partType,
          "null", (fid % 97).toInt)
        val delEntries = Seq(ManifestEntry(1, Some(9002L),
          DataFile(1, s"del/dv$fid.puffin", "PUFFIN", Vector("bucket" -> 0L),
            del.length.toLong, file.length.toLong, None, Some(dataPath),
            Some(dvMeta.offset), Some(dvMeta.length))))
        val em = IcebergManifests.synthManifestV3(delEntries, partType,
          "null", (fid % 97).toInt + 1)
        val list = IcebergManifests.synthManifestList(Seq(
          ManifestFile("meta/dm.avro", dm.length.toLong, 0, 9001L,
            1, 0, 0, vals.length.toLong, 0L, 0L, None, 0),
          ManifestFile("meta/em.avro", em.length.toLong, 0, 9001L,
            1, 0, 0, del.length.toLong, 0L, 0L, None, 1)),
          "null", (fid % 97).toInt + 2)
        val byPath = Map("meta/dm.avro" -> dm, "meta/em.avro" -> em,
          s"del/dv$fid.puffin" -> file)
        val st = IcebergManifests.replayV3(list, byPath.get)
          .getOrElse(sys.error(s"v3 replay failed: file $fid"))
        Iterator.single((fid, probed.blobs.length,
          if (probed.compressedFooter) 1 else 0,
          dvMeta.offset, dvMeta.length, positions.length.toLong, got,
          st.v2.effectiveRows))
      }.toDF("file_id", "n_blobs", "compressed", "dv_offset", "dv_length",
          "dv_cardinality", "rowsum", "effective_rows")
        .orderBy("file_id")
    },
    Some("""
      WITH r AS (SELECT doc_id // 40 AS file_id, doc_id,
                        row_number() OVER (PARTITION BY doc_id // 40
                          ORDER BY doc_id) - 1 AS rr
                 FROM documents)
      SELECT file_id, 2 AS n_blobs,
             CAST(CASE WHEN file_id % 2 = 0 THEN 1 ELSE 0 END AS INTEGER)
               AS compressed,
             CAST(4 AS BIGINT) AS dv_offset,
             CAST(CASE WHEN SUM(CASE WHEN rr % 5 = 2 THEN 1 ELSE 0 END) = 0
                  THEN 24
                  ELSE 44 + 2 * SUM(CASE WHEN rr % 5 = 2 THEN 1 ELSE 0 END)
                  END AS BIGINT) AS dv_length,
             CAST(SUM(CASE WHEN rr % 5 = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dv_cardinality,
             CAST(SUM(doc_id) AS BIGINT) AS rowsum,
             CAST(count(*) - SUM(CASE WHEN rr % 5 = 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS effective_rows
      FROM r GROUP BY file_id ORDER BY file_id"""))

  /** AUDIO FINGERPRINT NEAR-DUP — q331's perceptual dedup in the audio
    * modality with the REAL WAV codec in the loop: per document a
    * deterministic 130-sample PCM16 waveform (pattern keyed by group
    * g = v%50, class c = n%3 saturating 1–2 frame pairs to full scale)
    * encodes through the RIFF writer, decodes back through
    * [[graft.operators.MediaCodecs.decodeWavPcm16]] (chunk walk,
    * little-endian samples), and hashes to 64 bits of frame-energy
    * gradient (bit j = energy of 2-sample frame j+1 exceeds frame j —
    * the shape under Chromaprint/Shazam-style fingerprints). Candidates
    * come from the SAME [[graft.operators.Dedup.banded64Pairs]] join the
    * image and simhash families use. Offline validation: min cross-group
    * Hamming 6, same-group classes at 0–5, so the ≤ 2 filter keeps
    * exactly the planted near-dups.
    */
  /** The frame-energy fingerprint table (doc_id, sim64) q341 pairs over
    * — REAL WAV encode + decode per document; shared with the
    * cross-modal consensus audit.
    */
  private[queries] def audioHashTable(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val src = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("int").as("n"),
        pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
      .as[Round5Queries6.MediaSrc]
    src.map { r =>
      val g = r.v % 50
      val c = r.n % 3
      val samples = Array.tabulate(130) { i =>
        if (c == 1 && (i == 40 || i == 41)) 2000
        else if (c == 2 && (i == 20 || i == 21 || i == 80 || i == 81)) 2000
        else {
          val x = (g + 1).toLong * 7919L + (i + 1).toLong * 104729L
          (x * x % 99991L % 4001L - 2000L).toInt
        }
      }
      val bytes = MediaCodecs.encodeWavPcm16(8000, samples.map(_.toShort))
      val wav = MediaCodecs.decodeWavPcm16(bytes)
        .getOrElse(sys.error(s"synth wav failed to decode: doc ${r.doc_id}"))
      require(wav.samples.length == 130, "sample count drift")
      val e = Array.tabulate(65) { j =>
        val a = wav.samples(2 * j).toLong
        val b = wav.samples(2 * j + 1).toLong
        a * a + b * b
      }
      var h = 0L
      (0 until 64).foreach(j => if (e(j + 1) > e(j)) h |= 1L << j)
      (r.doc_id, h)
    }.toDF("doc_id", "sim64")
  }

  /** Oracle CTE chain producing `acand(doc_a, doc_b, alo, ahi, blo, bhi)`
    * — the closed-form audio-fingerprint banded candidates (names
    * prefixed `a*` so the chain composes with the dHash chain).
    */
  private[queries] def audioCandCtes: String =
    """ad AS (SELECT doc_id,
                      CAST(octet_length(encode(text)) AS INTEGER) % 3 AS c,
                      CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                        AS INTEGER) % 50 AS g
               FROM documents),
    asv AS (SELECT doc_id,
                  list_transform(range(0, 130), i ->
                    CASE WHEN c = 1 AND (i = 40 OR i = 41) THEN 2000
                         WHEN c = 2 AND (i = 20 OR i = 21 OR i = 80 OR i = 81)
                           THEN 2000
                         ELSE (((g + 1) * 7919 + (i + 1) * 104729)
                               * ((g + 1) * 7919 + (i + 1) * 104729))
                              % 99991 % 4001 - 2000 END) AS s
           FROM ad),
    aev AS (SELECT doc_id,
                  list_transform(range(0, 65), j ->
                    s[2 * j + 1] * s[2 * j + 1] + s[2 * j + 2] * s[2 * j + 2])
                    AS e
           FROM asv),
    ah AS (SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 32), j ->
                   CASE WHEN e[j + 2] > e[j + 1] THEN 1::BIGINT << j
                        ELSE 0::BIGINT END)) AS BIGINT) AS lo,
                 CAST(list_sum(list_transform(range(32, 64), j ->
                   CASE WHEN e[j + 2] > e[j + 1] THEN 1::BIGINT << (j - 32)
                        ELSE 0::BIGINT END)) AS BIGINT) AS hi
          FROM aev),
    abx AS (SELECT doc_id, lo, hi, u.j,
                   CASE u.j WHEN 0 THEN lo & 65535
                            WHEN 1 THEN (lo >> 16) & 65535
                            WHEN 2 THEN hi & 65535
                            ELSE (hi >> 16) & 65535 END AS bv
            FROM ah, unnest([0, 1, 2, 3]) AS u(j)),
    acand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
             FROM abx a JOIN abx b
               ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)"""

  val q341AudioFingerprint: QueryDef = QueryDef(
    "q341_audio_fingerprint",
    (s, dir) => Dedup.banded64Pairs(audioHashTable(s, dir), maxHamming = 2)
      .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $audioCandCtes
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi))
               AS INTEGER) AS hamming
      FROM acand
      WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 2
      ORDER BY doc_a, doc_b"""))

  /** FILL-IN-MIDDLE TRANSFORM — the code-model data op (Bavarian et al.
    * 2022): each document splits at two deterministic cut points into
    * prefix/middle/suffix, reassembles as PSM (`<P>pre<S>suf<M>mid`) or
    * SPM (`<S>suf<P>pre<M>mid`) by document parity, and the output pins
    * the cut arithmetic AND an md5 of the assembled string — the
    * transform is content-checked end to end, not just length-checked.
    * Pure per-row expression work: zero shuffles before the display
    * sort.
    */
  val q342FimTransform: QueryDef = QueryDef(
    "q342_fim_transform",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(col("n_chars") >= 8)
        .withColumn("v",
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("long"))
        .withColumn("half", expr("n_chars DIV 2"))
        .withColumn("c1", lit(1L) + expr("v % half"))
        .withColumn("c2",
          col("half") + 1L + expr("(v DIV 7) % (n_chars - half - 1)"))
        .withColumn("mode", expr("CAST(v % 2 AS INT)"))
        .withColumn("fim", expr(
          "CASE WHEN mode = 0 THEN concat('<P>', substring(text, 1, c1)," +
            " '<S>', substring(text, c2 + 1), '<M>'," +
            " substring(text, c1 + 1, c2 - c1))" +
            " ELSE concat('<S>', substring(text, c2 + 1)," +
            " '<P>', substring(text, 1, c1), '<M>'," +
            " substring(text, c1 + 1, c2 - c1)) END"))
        .select(col("doc_id"), col("mode"), col("c1"), col("c2"),
          (col("c2") - col("c1")).as("len_middle"),
          (col("n_chars") + 9L).as("n_assembled"),
          md5(col("fim")).as("fim_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, text, n_chars,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS BIGINT) AS v,
                        n_chars // 2 AS half
                 FROM documents WHERE n_chars >= 8),
      g AS (SELECT doc_id, v, half, n_chars, text,
                   1 + v % half AS c1,
                   half + 1 + (v // 7) % (n_chars - half - 1) AS c2,
                   CAST(v % 2 AS INTEGER) AS mode
            FROM d)
      SELECT doc_id, mode, c1, c2, c2 - c1 AS len_middle,
             n_chars + 9 AS n_assembled,
             md5(CASE WHEN mode = 0
                   THEN '<P>' || substr(text, 1, CAST(c1 AS INTEGER))
                     || '<S>' || substr(text, CAST(c2 + 1 AS INTEGER))
                     || '<M>' || substr(text, CAST(c1 + 1 AS INTEGER),
                                        CAST(c2 - c1 AS INTEGER))
                   ELSE '<S>' || substr(text, CAST(c2 + 1 AS INTEGER))
                     || '<P>' || substr(text, 1, CAST(c1 AS INTEGER))
                     || '<M>' || substr(text, CAST(c1 + 1 AS INTEGER),
                                        CAST(c2 - c1 AS INTEGER)) END)
               AS fim_md5
      FROM g ORDER BY doc_id"""))

  /** ICEBERG V3 DELETION VECTORS — the full merge-on-read chain across
    * three wire formats in one replay: per document a small table
    * synthesizes k REAL Avro data-manifest entries, a classic Avro
    * positional-delete file on f0, and a PUFFIN deletion vector on f1
    * (the q337 RoaringBitmapArray inside a q340 Puffin file, referenced
    * from the delete manifest through the v3 fields
    * `referenced_data_file`/`content_offset`/`content_size_in_bytes`).
    * [[graft.operators.IcebergManifests.replayV3]] enforces the spec
    * redundancy end to end — manifest arithmetic, puffin footer blob ==
    * manifest offsets, DV cardinality == record_count, positions in
    * range, one DV per data file — and the oracle recomputes every
    * count AND the DV geometry (offset 4, framed length 44 + 2·|DV| —
    * the 32 + 2n one-container bitmap plus the v3 framing's 12-byte
    * envelope; |DV| = (rc1+1) div 3 ≥ 7 here, so the empty-DV branch
    * is unreachable at any scale factor)
    * closed-form, so a drift anywhere in manifest⋈puffin⋈bitmap lands
    * in the hash.
    */
  val q343IcebergV3Dv: QueryDef = QueryDef(
    "q343_iceberg_v3_dv",
    (s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("int").as("n"),
          pmod(HashFunctions.hash32(col("text")), lit(200)).cast("int").as("v"))
        .as[Round5Queries6.MediaSrc]
      val probed = src.mapPartitions { rows =>
        import graft.operators.AvroOcf.{TInt, TRecord}
        import graft.operators.IcebergManifests
        import graft.operators.IcebergManifests._
        val partType = TRecord("r102", Vector("bucket" -> TInt))
        rows.map { r =>
          val codec = Seq("null", "deflate", "snappy")(r.v % 3)
          val k = 2 + r.n % 3
          def rc(i: Int): Long = 20L + (r.n + 3 * i) % 30
          val dataEntries = (0 until k).map { i =>
            ManifestEntry(1, Some(9001L),
              DataFile(0, s"data/f$i.parquet", "PARQUET",
                Vector("bucket" -> (i % 4).toLong), rc(i),
                500L + (r.v + 5 * i) % 200))
          }
          val dm = IcebergManifests.synthManifest(dataEntries, partType,
            codec, r.v)
          // classic positional file: first p positions of f0
          val p = 1 + r.v % 3
          val pos = IcebergManifests.synthPosDeletes(
            (0 until p).map(i => ("data/f0.parquet", i.toLong)),
            codec, r.v + 1)
          // PUFFIN DV on f1: positions ≡ 1 (mod 3) below f1's row count,
          // in the v3 FRAMED form (BE length + magic + bitmap + CRC-32)
          val dvPositions = (0L until rc(1)).filter(_ % 3 == 1).toArray
          val dvBlob = graft.operators.DeletionVectors
            .serializeDvBlob(dvPositions)
          val puffin = graft.operators.Puffin.write(
            Seq("deletion-vector-v1" -> dvBlob), snapshotId = 9002L,
            sequenceNumber = 2L, properties = Map("created-by" -> "graft"),
            compressFooter = r.v % 2 == 0)
          val delEntries = Seq(
            ManifestEntry(1, Some(9002L), DataFile(1, "del/p0.avro",
              "AVRO", Vector("bucket" -> 0L), p.toLong, pos.length.toLong)),
            ManifestEntry(1, Some(9002L), DataFile(1, "del/dv0.puffin",
              "PUFFIN", Vector("bucket" -> 1L), dvPositions.length.toLong,
              puffin.length.toLong, None, Some("data/f1.parquet"),
              Some(4L), Some(dvBlob.length.toLong))))
          val em = IcebergManifests.synthManifestV3(delEntries, partType,
            codec, r.v + 9)
          def mf(path: String, bytes: Array[Byte],
              es: Seq[ManifestEntry], content: Int) = {
            def c(st: Int) = es.count(_.status == st)
            def rcs(st: Int) =
              es.filter(_.status == st).map(_.dataFile.recordCount).sum
            ManifestFile(path, bytes.length.toLong, 0, 9001L,
              c(1), c(0), c(2), rcs(1), rcs(0), rcs(2), None, content)
          }
          val list = IcebergManifests.synthManifestList(
            Seq(mf("meta/dm.avro", dm, dataEntries, 0),
              mf("meta/em.avro", em, delEntries, 1)), codec, r.v + 11)
          val byPath = Map("meta/dm.avro" -> dm, "meta/em.avro" -> em,
            "del/p0.avro" -> pos, "del/dv0.puffin" -> puffin)
          val st = IcebergManifests.replayV3(list, byPath.get)
            .getOrElse(sys.error(s"v3 replay failed: doc ${r.doc_id}"))
          val dv = st.dvEntries.head
          (r.doc_id, codec, st.v2.base.live.size, st.v2.base.liveRows,
            st.v2.deletedPositions.values.sum, st.v2.effectiveRows,
            dv.recordCount, dv.contentOffset.get, dv.contentSize.get)
        }
      }
      probed.toDF("doc_id", "codec", "n_live", "live_rows", "pos_deleted",
          "effective_rows", "dv_cardinality", "dv_offset", "dv_length")
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n,
                        CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 200
                          AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT doc_id, n, v, 2 + n % 3 AS k, 1 + v % 3 AS p,
                   20 + (n + 3) % 30 AS rc1
            FROM d),
      u AS (SELECT *,
                   list_sum(list_transform(range(k),
                     i -> 20 + (n + 3 * i) % 30)) AS liverows,
                   (rc1 + 1) // 3 AS dvcard
            FROM g)
      SELECT doc_id,
             (['null', 'deflate', 'snappy'])[v % 3 + 1] AS codec,
             CAST(k AS INTEGER) AS n_live,
             CAST(liverows AS BIGINT) AS live_rows,
             CAST(p + dvcard AS BIGINT) AS pos_deleted,
             CAST(liverows - p - dvcard AS BIGINT) AS effective_rows,
             CAST(dvcard AS BIGINT) AS dv_cardinality,
             CAST(4 AS BIGINT) AS dv_offset,
             CAST(44 + 2 * dvcard AS BIGINT) AS dv_length
      FROM u ORDER BY doc_id"""))

  /** CROSS-MODAL NEAR-DUP CONSENSUS — the audit a multimodal corpus runs
    * before deleting anything: a pair counts only when flagged by ≥ 2
    * INDEPENDENT modalities — text simhash (q27's banded pairs with the
    * length rule), image dHash (q331, real BMP decode), audio
    * frame-energy fingerprint (q341, real WAV decode), and (r15) video
    * keyframe-gradient fingerprint (q346, real ISO-BMFF walk + ranged
    * reads). All four candidate generators are the SAME four-band
    * pigeonhole equi-join ([[graft.operators.Dedup.banded64Pairs]] /
    * [[graft.operators.Dedup.simhashPairs]]), so the union's cost is
    * four hash joins and one aggregate — never a corpus square in any
    * modality. Output carries the modality bitmask (text=1, image=2,
    * audio=4, video=8); the oracle composes the four closed-form
    * candidate chains (shared builders, so a drift in any one query's
    * oracle and this one cannot diverge).
    */
  val q344CrossModalConsensus: QueryDef = QueryDef(
    "q344_crossmodal_consensus",
    (s, dir) => {
      val text = Dedup.simhashPairs(
          Tables.load(s, dir, "documents"), shingleK = 3, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), lit(1).as("m"))
      val img = Dedup.banded64Pairs(Round13Queries2.phashTable(s, dir),
          maxHamming = 2)
        .select(col("doc_a"), col("doc_b"), lit(2).as("m"))
      val aud = Dedup.banded64Pairs(audioHashTable(s, dir), maxHamming = 2)
        .select(col("doc_a"), col("doc_b"), lit(4).as("m"))
      val vid = Dedup.banded64Pairs(Round15Queries.videoHashTable(s, dir),
          maxHamming = 2)
        .select(col("doc_a"), col("doc_b"), lit(8).as("m"))
      text.unionAll(img).unionAll(aud).unionAll(vid)
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).cast("int").as("n_modalities"),
          sum(col("m")).cast("int").as("modality_mask"))
        .filter(col("n_modalities") >= 2)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH ${DedupQueries.shingleCtes},
      ths AS (SELECT doc_id, n_chars,
                list_transform(sh, t -> (('0x' || substr(md5(t), 1, 8))::BIGINT)) AS lo,
                list_transform(sh, t -> (('0x' || substr(md5(t), 9, 8))::BIGINT)) AS hi
              FROM s),
      tsim AS (SELECT doc_id, n_chars,
                 ${DedupQueries.simExpr("lo", 0, 32)} +
                   ${DedupQueries.simExpr("hi", 32, 31)} AS sim64
               FROM ths),
      tbx AS (SELECT doc_id, n_chars, sim64, b,
                     (sim64 >> (16 * b)) & 65535 AS key
              FROM tsim, generate_series(0, 3) g(b)),
      tcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.sim64 AS sa, b.sim64 AS sb,
                       a.n_chars AS nca, b.n_chars AS ncb
                FROM tbx a JOIN tbx b
                  ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
      tp AS (SELECT doc_a, doc_b, 1 AS m FROM tcand
             WHERE bit_count(xor(sa, sb)) <= 3 AND abs(nca - ncb) <= 16),
      ${Round13Queries2.phashCandCtes},
      ip AS (SELECT doc_a, doc_b, 2 AS m FROM pcand
             WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 2),
      $audioCandCtes,
      ap AS (SELECT doc_a, doc_b, 4 AS m FROM acand
             WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 2),
      ${Round15Queries.videoCandCtes},
      vp AS (SELECT doc_a, doc_b, 8 AS m FROM vcand
             WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 2),
      u AS (SELECT * FROM tp UNION ALL SELECT * FROM ip
            UNION ALL SELECT * FROM ap UNION ALL SELECT * FROM vp)
      SELECT doc_a, doc_b, CAST(count(*) AS INTEGER) AS n_modalities,
             CAST(SUM(m) AS INTEGER) AS modality_mask
      FROM u GROUP BY 1, 2 HAVING count(*) >= 2
      ORDER BY doc_a, doc_b"""))

  val all: Seq[QueryDef] = Seq(q340PuffinDv, q341AudioFingerprint,
    q342FimTransform, q343IcebergV3Dv, q344CrossModalConsensus)
}
