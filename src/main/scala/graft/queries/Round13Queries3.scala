package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 additions, third tranche: page-index scan pruning — the IO
  * lever BELOW row-group pruning. A 100 TB lake's files carry a page
  * index (parquet-format's ColumnIndex/OffsetIndex, stored outside the
  * pages) precisely so a selective predicate can skip most of a row
  * group's pages without touching one data byte; this tranche reads that
  * structure with the repo's own Thrift walker and proves the skip
  * arithmetic against a closed-form oracle.
  */
object Round13Queries3 {

  /** PAGE-INDEX PRUNING — the sub-row-group scan planner: per doc_id%8
    * bucket, the bucket's sorted ids become a REAL parquet-mr file cut
    * into exact 40-row pages ([[graft.operators.ParquetSynth.synthPaged]]
    * — `withPageRowCountLimit` makes the page grid deterministic), the
    * page index is read back through the repo's own Thrift compact
    * walker ([[graft.operators.ParquetFooter.pageIndex]]: OffsetIndex
    * first_row_index ⋈ ColumnIndex min/max), and each page gets the
    * standard skip verdict for `val BETWEEN 120 AND 260` (keep iff
    * max ≥ lo ∧ min ≤ hi, null pages never kept). The oracle rebuilds
    * every page's geometry and stats from `documents` alone (rank within
    * bucket // 40), so a page boundary off by one row, a min/max stat
    * decoded from the wrong bytes, or a first_row_index misread all
    * hash-mismatch. One file per GROUP, never per row (the q276 writer-
    * contention lesson).
    */
  val q336PageIndexPrune: QueryDef = QueryDef(
    "q336_page_index_prune",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      ids.groupByKey(_ % 8).flatMapGroups { (bucket, it) =>
        import graft.operators.{ParquetFooter, ParquetSynth}
        val vals = it.toArray.sorted
        val bytes = ParquetSynth.synthPaged(vals.toSeq, pageRowLimit = 40)
        val pages = ParquetFooter.pageIndex(bytes, "val")
          .getOrElse(sys.error(s"page index parse failed: bucket $bucket"))
        require(pages.iterator.map(_.nRows).sum == vals.length.toLong,
          s"page rows drift: bucket $bucket")
        pages.iterator.map { p =>
          val pmin = p.min.getOrElse(sys.error("missing page min"))
          val pmax = p.max.getOrElse(sys.error("missing page max"))
          val kept = !p.nullPage && pmax >= 120L && pmin <= 260L
          (bucket, p.page, p.firstRow, p.nRows, pmin, pmax,
            if (kept) 1 else 0)
        }
      }.toDF("bucket", "page", "first_row", "n_rows", "pmin", "pmax", "kept")
        .orderBy("bucket", "page")
    },
    Some("""
      WITH r AS (SELECT doc_id % 8 AS bucket, doc_id,
                        row_number() OVER (PARTITION BY doc_id % 8
                          ORDER BY doc_id) - 1 AS rr
                 FROM documents)
      SELECT bucket, CAST(rr // 40 AS INTEGER) AS page,
             CAST(min(rr) AS BIGINT) AS first_row,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(doc_id) AS pmin, max(doc_id) AS pmax,
             CAST(CASE WHEN max(doc_id) >= 120 AND min(doc_id) <= 260
                  THEN 1 ELSE 0 END AS INTEGER) AS kept
      FROM r GROUP BY bucket, rr // 40
      ORDER BY bucket, page"""))

  /** DELTA DELETION VECTORS — row-level deletes without rewriting the
    * data file, the Delta-protocol twin of q279's Iceberg positional
    * deletes: per doc_id%8 bucket, positions ≡ 3 (mod 7) of the bucket's
    * sorted rows are deleted through the full INLINE-DV wire path —
    * 64-bit RoaringBitmapArray (portable: magic + keyed 32-bit roaring
    * bitmaps with cookie/descriptive/offset headers) → Z85 string →
    * `deletionVector` descriptor → decode → subtract at scan
    * ([[graft.operators.DeletionVectors]]). The oracle pins the survivor
    * arithmetic AND the serialized byte length closed-form (32 + 2·|DV|
    * for one array container: magic 4 + count 8 + key 4 + cookie 4 +
    * nContainers 4 + descriptive 4 + offset 4 + 2 bytes/position; 12 —
    * magic + key count only — when the bucket deletes nothing, which a
    * sub-4-row bucket at a tiny scale factor can produce), so a drifted
    * container layout — not just a wrong survivor set — lands in the
    * hash.
    */
  val q337DeletionVectors: QueryDef = QueryDef(
    "q337_deletion_vectors",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      ids.groupByKey(_ % 8).flatMapGroups { (bucket, it) =>
        import graft.operators.DeletionVectors
        val vals = it.toArray.sorted
        val del = vals.indices.collect { case p if p % 7 == 3 => p.toLong }.toArray
        val desc = DeletionVectors.encodeInline(del)
        val decoded = DeletionVectors.decodeInline(desc)
          .getOrElse(sys.error(s"inline DV decode failed: bucket $bucket"))
        require(java.util.Arrays.equals(decoded, del),
          s"DV roundtrip drift: bucket $bucket")
        val delSet = decoded.map(_.toInt).toSet
        var survSum = 0L
        var delSum = 0L
        vals.indices.foreach { p =>
          if (delSet.contains(p)) delSum += vals(p) else survSum += vals(p)
        }
        Iterator.single((bucket, vals.length.toLong, desc.cardinality,
          desc.sizeInBytes.toLong, survSum, delSum))
      }.toDF("bucket", "n_rows", "dv_cardinality", "dv_bytes",
          "surviving_sum", "deleted_sum")
        .orderBy("bucket")
    },
    Some("""
      WITH r AS (SELECT doc_id % 8 AS bucket, doc_id,
                        row_number() OVER (PARTITION BY doc_id % 8
                          ORDER BY doc_id) - 1 AS rr
                 FROM documents)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN rr % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS dv_cardinality,
             CAST(CASE WHEN SUM(CASE WHEN rr % 7 = 3 THEN 1 ELSE 0 END) = 0
                  THEN 12 -- empty bitmap: magic 4 + key count 8, no keys
                  ELSE 32 + 2 * SUM(CASE WHEN rr % 7 = 3 THEN 1 ELSE 0 END)
                  END AS BIGINT) AS dv_bytes,
             CAST(SUM(CASE WHEN rr % 7 = 3 THEN 0 ELSE doc_id END)
               AS BIGINT) AS surviving_sum,
             CAST(SUM(CASE WHEN rr % 7 = 3 THEN doc_id ELSE 0 END)
               AS BIGINT) AS deleted_sum
      FROM r GROUP BY bucket ORDER BY bucket"""))

  /** FIXED-WINDOW RATE LIMITING — ingestion quota enforcement, the batch
    * twin of [[graft.streaming.EventsStreaming.quotaPerUserWindow]] (the
    * q323 batch-twin protocol): within each (user, 10-minute window) the
    * first 5 events by (event time, event_id) are admitted, the rest
    * rejected, and the audit reports per-cell counts plus the
    * exact-decimal value mass that got through. One partitioned window
    * rank — no unpartitioned window, no state larger than a rank. The
    * streaming side enforces the same quota incrementally in
    * mapGroupsWithState keyed by (user, window); StreamingSpec pins
    * batch/stream parity across micro-batch splits.
    */
  val q338RateLimit: QueryDef = QueryDef(
    "q338_rate_limit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "win").orderBy("us", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("win", expr("us DIV 600000000"))
        .withColumn("adm", row_number().over(w) <= 5)
        .groupBy("user_id", "win")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("adm"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("adm"), 0L).otherwise(1L)).as("n_rejected"),
          graft.functions.Det.dsum(
            when(col("adm"), col("value")).otherwise(lit(0.0d)))
            .as("admitted_value"))
        .orderBy("user_id", "win")
    },
    Some(s"""
      WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us,
                        epoch_us(ts) // 600000000 AS win
                 FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id, win
                        ORDER BY us, event_id) AS rk
            FROM e)
      SELECT user_id, win, CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN rk <= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_admitted,
             CAST(SUM(CASE WHEN rk <= 5 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_rejected,
             ${graft.functions.Det.dsumSql(
               "CASE WHEN rk <= 5 THEN value ELSE 0e0 END")} AS admitted_value
      FROM r GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** HELD-OUT LM SCORING WITH BACKOFF — the CCNet-style quality filter
    * q283 could not express: the Kneser–Ney bigram model trains on the
    * EVEN documents only, and the ODD documents score against it, so the
    * zero-count paths are load-bearing — an unseen bigram backs off to
    * the discount mass times the continuation probability, an unseen
    * history to the continuation probability alone, and an unseen
    * continuation word to the 0.5/|bigram types| floor. Model state is
    * vocabulary-sized broadcast joins; the per-document sum folds in
    * bigram-sorted order (the order-pinned-fold protocol) so the double
    * accumulation is engine-identical.
    */
  val q339LmBackoffScore: QueryDef = QueryDef(
    "q339_lm_backoff_score",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 2)
      def bigrams(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"),
          explode(graft.plans.WordGrams(col("text"), 2, ' ')).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      val tb = bigrams(docs.filter(col("doc_id") % 2 === 0))
        .groupBy("bg").agg(sum(col("c")).as("cb"))
        .withColumn("prev", element_at(split(col("bg"), " "), 1))
        .withColumn("w2", element_at(split(col("bg"), " "), 2))
        .transform(graft.operators.ScopedCache.cache)
      val prevc = tb.groupBy("prev").agg(sum(col("cb")).as("cp"),
        count(lit(1)).as("np"))
      val contc = tb.groupBy("w2").agg(count(lit(1)).as("nc"))
      val btypes = tb.agg(count(lit(1)).as("bt"))
      val sb = bigrams(docs.filter(col("doc_id") % 2 === 1))
        .withColumn("prev", element_at(split(col("bg"), " "), 1))
        .withColumn("w2", element_at(split(col("bg"), " "), 2))
      val pcont = coalesce(col("nc") / col("bt"), lit(0.5d) / col("bt"))
      val p = when(col("cb").isNotNull,
          (col("cb") - 0.75d) / col("cp") +
            (lit(0.75d) * col("np") / col("cp")) * (col("nc") / col("bt")))
        .when(col("cp").isNotNull,
          (lit(0.75d) * col("np") / col("cp")) * pcont)
        .otherwise(pcont)
      sb.join(broadcast(tb.select("bg", "cb")), Seq("bg"), "left")
        .join(broadcast(prevc), Seq("prev"), "left")
        .join(broadcast(contc), Seq("w2"), "left")
        .crossJoin(broadcast(btypes))
        .withColumn("t", col("c") * log2(p))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_bigrams"),
          sum(when(col("cb").isNull, 1L).otherwise(0L)).as("n_unseen_bg"),
          sum(when(col("cp").isNull, 1L).otherwise(0L)).as("n_unseen_prev"),
          array_sort(collect_list(struct(col("bg"), col("t")))).as("terms"))
        .select(col("doc_id"), col("n_bigrams"), col("n_unseen_bg"),
          col("n_unseen_prev"),
          graft.functions.Det.rdet(
            aggregate(col("terms"), lit(0.0d), (acc, x) => acc + x("t")) /
              col("n_bigrams"), 6).as("avg_logprob"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
      db AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg,
                    CAST(count(*) AS BIGINT) AS c
             FROM d, unnest(range(1, len(ws))) AS u(i) GROUP BY 1, 2),
      tb AS (SELECT bg, SUM(c) AS cb, str_split(bg, ' ')[1] AS prev,
                    str_split(bg, ' ')[2] AS w2
             FROM db WHERE doc_id % 2 = 0 GROUP BY 1),
      prevc AS (SELECT prev, SUM(cb) AS cp, CAST(count(*) AS BIGINT) AS np
                FROM tb GROUP BY 1),
      contc AS (SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM tb GROUP BY 1),
      bt AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM tb),
      sb AS (SELECT doc_id, bg, c, str_split(bg, ' ')[1] AS prev,
                    str_split(bg, ' ')[2] AS w2
             FROM db WHERE doc_id % 2 = 1),
      terms AS (
        SELECT s.doc_id, CAST(SUM(s.c) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN tb.cb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unseen_bg,
               CAST(SUM(CASE WHEN prevc.cp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unseen_prev,
               list(s.c * log2(
                 CASE WHEN tb.cb IS NOT NULL THEN
                   (tb.cb - 0.75e0) / prevc.cp +
                     (0.75e0 * prevc.np / prevc.cp) *
                       (contc.nc / CAST(bt.bt AS DOUBLE))
                 WHEN prevc.cp IS NOT NULL THEN
                   (0.75e0 * prevc.np / prevc.cp) *
                     COALESCE(contc.nc / CAST(bt.bt AS DOUBLE), 0.5e0 / bt.bt)
                 ELSE COALESCE(contc.nc / CAST(bt.bt AS DOUBLE), 0.5e0 / bt.bt)
                 END) ORDER BY s.bg) AS ts
        FROM sb s
        LEFT JOIN tb ON tb.bg = s.bg
        LEFT JOIN prevc ON prevc.prev = s.prev
        LEFT JOIN contc ON contc.w2 = s.w2
        CROSS JOIN bt
        GROUP BY s.doc_id)
      SELECT doc_id, n_bigrams, n_unseen_bg, n_unseen_prev,
             floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), ts),
                     (acc, v) -> acc + v) / n_bigrams * 1e6 + 0.5) / 1e6
               AS avg_logprob
      FROM terms ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q336PageIndexPrune, q337DeletionVectors,
    q338RateLimit, q339LmBackoffScore)
}
