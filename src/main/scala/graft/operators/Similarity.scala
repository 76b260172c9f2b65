package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * [[topKBrute]] is the exact baseline: broadcast the (small) query set,
  * score every corpus vector map-side, rank per query. One shuffle (the
  * window per q_id) — at 100 TB the corpus side streams through executors
  * once; only q×k survivors shuffle.
  *
  * [[topKByLabel]] is the IVF-style scale path: an inverted-file pass that
  * probes only the query's coarse partition (here the `label` column stands
  * in for a centroid assignment, which a k-means fit would produce). The
  * candidate set — and the shuffle — shrinks by the number of partitions.
  *
  * Norms are precomputed per vector (and cached on the pair-heavy paths):
  * cosine per pair then costs one dot-product fold instead of three. The
  * arithmetic stays dot/(norm_a*norm_b) — identical to the oracle's
  * dot/(sqrt(ssq_a)*sqrt(ssq_b)).
  */
object Similarity {

  private def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm", norm2(col("embedding")))

  /** Exact top-k by cosine for each query vector (query set = vec_id <
    * nQueries). Cosine is rounded (Det.rdet 6) before ranking so rank order
    * is reproducible; ties break by vec_id.
    */
  def topKBrute(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val c = withNorm(emb)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Det.rdet(dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "cos")
  }

  /** IVF-style top-k: probe only vectors sharing the query's label
    * (coarse-quantizer cell). Same output shape as [[topKBrute]].
    */
  def topKByLabel(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val c = withNorm(emb)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").as("q_label"))
    val scored = c.join(broadcast(q),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Det.rdet(dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "cos")
  }

  /** Fixed ±1 random-hyperplane matrix for sign-LSH bucketing (seed-fixed so
    * the oracle SQL embeds the identical literals). 8 planes → 256 buckets.
    */
  val Hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(1234)
    Array.fill(8, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-LSH bucket id of an embedding column: bit j = sign of the
    * projection onto hyperplane j.
    */
  def lshBucket(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Hyperplanes.zipWithIndex.map { case (h, j) =>
      when(graft.plans.VectorDotProduct(emb, typedLit(h.toSeq)) > 0.0d, 1 << j).otherwise(0)
    }.reduce(_ + _)

  /** LSH-bucketed top-k — the second scale path beside [[topKByLabel]]:
    * candidates come only from the query's sign-LSH bucket, so the probe is
    * an equi-join on the bucket id (≈ corpus/256 of the work per query).
    */
  def topKLshBucket(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val c = withNorm(emb).withColumn("bucket", lshBucket(col("embedding"))).transform(ScopedCache.cache)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Det.rdet(dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "cos")
  }

  /** Trained-quantizer IVF top-k with MULTI-PROBE — the generic form of
    * q79's inline plan, shared with CorpusScaleBench's recall measurement:
    * Lloyd-trained centroids ([[KMeans.fitCentroids]]) index the corpus
    * once; each query (vec_id < nQueries) probes its `nprobe` nearest cells
    * and ranks candidates by exact squared L2. Cost scales with
    * nprobe/kClusters of the corpus per query; the corpus itself never
    * shuffles — centroids and queries broadcast into its partitions.
    */
  def topKIvfMultiprobe(emb: DataFrame, nQueries: Int, k: Int,
                        kClusters: Int, iters: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= kClusters, s"nprobe $nprobe out of range")
    val centroids = KMeans.fitCentroids(emb, kClusters, iters)
    val index = KMeans.assignments(emb, centroids)
      .select(col("vec_id"), col("cluster"), col("embedding"))
    val wq = Window.partitionBy("vec_id").orderBy(col("d2"), col("cluster"))
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", KMeans.d2Col)
      .withColumn("rkc", row_number().over(wq))
      .filter(col("rkc") <= nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cluster"))
    val pairD2 = dot(col("embedding"), col("embedding")) -
      lit(2.0d) * dot(col("embedding"), col("q_emb")) +
      dot(col("q_emb"), col("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("vec_id"))
    index.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", Det.rdet(pairD2, 6))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "d2")
  }

  /** Exact top-k by squared L2 (the multiprobe family's ground truth —
    * [[topKBrute]] ranks by cosine, which is a different metric).
    */
  def topKBruteL2(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val pairD2 = dot(col("embedding"), col("embedding")) -
      lit(2.0d) * dot(col("embedding"), col("q_emb")) +
      dot(col("q_emb"), col("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("vec_id"))
    emb.select(col("vec_id"), col("embedding"))
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d2", Det.rdet(pairD2, 6))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "d2")
  }

  /** Product-quantization-style codes: the 64-dim embedding splits into 8
    * subvectors of 8 dims; each subvector gets a 2-bit sign-LSH code (two
    * seed-fixed hyperplanes), packed into a 16-bit code. A deterministic
    * stand-in for trained PQ codebooks — the plan shape (slice → project →
    * pack) is identical, and at 100 TB the 2-byte code column replaces the
    * 256-byte vector for coarse candidate generation.
    */
  val PqPlanes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(99)
    Array.fill(8, 2, 8)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  def pqCode(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (for {
      s <- 0 until 8
      b <- 0 until 2
    } yield when(
      graft.plans.VectorDotProduct(
        slice(emb, s * 8 + 1, 8), typedLit(PqPlanes(s)(b).toSeq)) > 0.0d,
      1 << (2 * s + b)).otherwise(0)).reduce(_ + _)

  /** PQ-HAMMING SHORTLIST + EXACT RE-RANK — the two-stage ANN every
    * production deployment runs: stage 1 keeps only corpus vectors whose
    * 16-bit [[pqCode]] lies within Hamming `radius` of the query's code
    * (a codes-only scan — at 100 TB the code column is 2 bytes/vector and
    * the full-precision vectors are touched ONLY for the shortlist);
    * stage 2 re-ranks the shortlist by exact rounded cosine. Same output
    * shape as [[topKBrute]]. The query side broadcasts; the corpus never
    * shuffles.
    */
  def topKPqRerank(emb: DataFrame, nQueries: Int, k: Int,
      radius: Int): DataFrame = {
    val c = withNorm(emb).withColumn("pq_code", pqCode(col("embedding")))
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("pq_code").as("q_code"))
    val scored = c.join(broadcast(q),
        col("vec_id") =!= col("q_id") &&
          expr("bit_count(pq_code ^ q_code)") <= radius)
      .select(col("q_id"), col("vec_id"),
        Det.rdet(dot(col("embedding"), col("q_emb")) /
          (col("nrm") * col("q_nrm")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "cos")
  }

  /** Stage-1 shortlist size per query for [[topKPqRerank]] — zero-candidate
    * queries surface as 0, not as a missing row.
    */
  def pqCandidateCounts(emb: DataFrame, nQueries: Int,
      radius: Int): DataFrame = {
    val coded = emb.select(col("vec_id"), pqCode(col("embedding")).as("pq_code"))
    val q = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("pq_code").as("q_code"))
    val hits = coded.join(broadcast(q),
        col("vec_id") =!= col("q_id") &&
          expr("bit_count(pq_code ^ q_code)") <= radius)
      .groupBy("q_id").agg(count(lit(1)).as("n_candidates"))
    q.select(col("q_id")).join(hits, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_candidates"))
  }

  /** Quantize a corpus: (vec_id, label, pq_code, n_same_code). */
  def pqQuantize(emb: DataFrame): DataFrame = {
    val coded = emb.select(col("vec_id"), col("label"), pqCode(col("embedding")).as("pq_code"))
    val w = Window.partitionBy("pq_code")
    coded.withColumn("n_same_code", count(lit(1)).over(w))
  }

  /** CONTRASTIVE PAIR MINING — the training-data operator behind
    * embedding-model fine-tuning: per anchor vector, the best POSITIVE
    * (highest cosine ≥ `threshold` among same-label candidates) and the
    * HARDEST NEGATIVE (highest cosine strictly below the threshold — the
    * near-miss that teaches the margin), with the resulting margin.
    * Anchors lacking either side are dropped (no pair to train on).
    * Label-blocked like [[embeddingDupPairs]] — candidate generation never
    * goes corpus × corpus — and both extremes come out of ONE hash
    * aggregation via conditional max_by (never two joins). Ties break to
    * the smallest candidate id; cosines are Det.rdet-rounded before the
    * threshold compare so both engines pick identical pairs.
    */
  def contrastiveMining(emb: DataFrame, threshold: Double): DataFrame = {
    val c = withNorm(emb.select(col("vec_id"), col("label"), col("embedding")))
      .transform(ScopedCache.cache)
    val pairs = c.as("a").join(c.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("cand"),
        Det.rdet(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos"))
    pairs.groupBy("anchor")
      .agg(
        max_by(struct(col("cand"), col("cos")),
          when(col("cos") >= threshold, struct(col("cos"), -col("cand"))))
          .as("pos"),
        max_by(struct(col("cand"), col("cos")),
          when(col("cos") < threshold, struct(col("cos"), -col("cand"))))
          .as("neg"))
      .filter(col("pos").isNotNull && col("neg").isNotNull)
      .select(col("anchor"),
        col("pos.cand").as("pos_id"), col("pos.cos").as("pos_cos"),
        col("neg.cand").as("neg_id"), col("neg.cos").as("neg_cos"),
        Det.rdet(col("pos.cos") - col("neg.cos"), 6).as("margin"))
  }

  // ------------------------------------------------------------------
  // Persisted ANN index lifecycle (round 13) — the Dedup.writeLshIndex
  // pattern applied to the vector family
  // ------------------------------------------------------------------

  /** PERSISTED ANN INDEX, build verb. Until round 13 [[topKPqRerank]]
    * computed PQ codes INLINE from the full `embedding` column, so its
    * stage-1 *IO* read the 256-byte vector for every corpus row even
    * though its *compute* only needed the 2-byte code; likewise
    * [[topKIvfMultiprobe]] re-trained its coarse quantizer per call. The
    * stored layout separates the three concerns:
    *
    *   - `codesTable` (vec_id, cluster, pq_code): the 2-byte PQ code plus
    *     the trained IVF cell per vector, bucketed + sorted by `cluster`
    *     so an IVF probe's candidate join reads its cells off the buckets
    *     exchange-free. The PQ Hamming stage scans ONLY this table — at
    *     100 TB that is ~1/40th the bytes of the vector column (and the
    *     parquet scan prunes to the two small columns it needs).
    *   - `vecTable` (vec_id, embedding, nrm): full-precision vectors with
    *     precomputed norms, bucketed + sorted by `vec_id` — the exact
    *     re-rank fetches the SHORTLIST rows by key off the buckets; the
    *     corpus-wide vector column is never scanned at probe time.
    *   - `centroidTable` (cluster, centroid): the Lloyd-trained coarse
    *     quantizer, kClusters rows — probes broadcast it; probing never
    *     re-trains.
    *
    * Same catalog discipline as [[Dedup.writeLshIndex]]: EXTERNAL-with-path
    * catalog tables (bucket metadata only persists on catalog tables;
    * overwrite must survive a fresh session's empty in-memory catalog),
    * and the build parameters are stamped as a table property so
    * [[ensureAnnIndex]] refuses to serve an index built with different
    * (kClusters, iters, buckets).
    */
  def writeAnnIndex(emb: DataFrame, kClusters: Int, iters: Int,
      codesTable: String, vecTable: String, centroidTable: String,
      buckets: Int = 8, basePath: Option[String] = None): Unit = {
    val spark = emb.sparkSession
    Seq(codesTable, vecTable, centroidTable).foreach(Dedup.requireValidTable)
    val base = basePath.getOrElse(spark.sessionState.conf.warehousePath)
    def save(df: DataFrame, table: String, bucketCols: Seq[String]): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      // bucket-aligned repartition, same rationale as Dedup.writeLshIndex:
      // one file per bucket instead of one per (upstream task, bucket) —
      // the 257-file vecTable measured at sf0.1 made every COLD probe pay
      // ~250 opens + footer reads before touching data
      val part =
        if (bucketCols.isEmpty) df
        else df.repartition(buckets, bucketCols.map(col): _*)
      val w = part.write.format("parquet").mode("overwrite")
        .option("path", s"$base/$table")
      (if (bucketCols.isEmpty) w
       else w.bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
         .sortBy(bucketCols.head, bucketCols.tail: _*))
        .saveAsTable(table)
    }
    val centroids = KMeans.fitCentroids(emb, kClusters, iters)
    save(centroids, centroidTable, Nil) // kClusters rows: no bucketing
    save(KMeans.assignments(emb, centroids)
      .select(col("vec_id"), col("cluster"), pqCode(col("embedding")).as("pq_code")),
      codesTable, Seq("cluster"))
    save(withNorm(emb.select(col("vec_id"), col("embedding"))),
      vecTable, Seq("vec_id"))
    spark.sql(s"ALTER TABLE $codesTable SET TBLPROPERTIES(" +
      s"'graft.ann.params' = '${annParamsKey(kClusters, iters, buckets)}')")
  }

  private def annParamsKey(kClusters: Int, iters: Int, buckets: Int): String =
    s"k=$kClusters,it=$iters,buckets=$buckets"

  private def storedAnnParams(spark: org.apache.spark.sql.SparkSession,
      table: String): Option[String] = {
    val rows = spark.sql(s"SHOW TBLPROPERTIES $table")
      .filter(col("key") === "graft.ann.params")
      .select("value").collect() // catalog metadata: one tiny driver row
    rows.headOption.map(_.getString(0))
  }

  /** Build-once guard, mirroring [[Dedup.ensureLshIndex]]: rebuild only
    * when any of the three tables is absent, the stored build-parameter
    * fingerprint differs, or the vector count changed (the append-only
    * freshness key — an in-place embedding UPDATE needs a content
    * fingerprint instead, exactly the LSH lifecycle's documented
    * contract). Returns true when a build ran.
    */
  /** Serializes concurrent ensure/build races WITHIN this JVM: two
    * sessions/threads ensuring the same tables at once (ThroughputBench
    * runs the whole surface concurrently; q327 and q328 share one index)
    * would otherwise interleave the check with the other's DROP+rebuild.
    * Cross-JVM build coordination is the metastore's concern, not this
    * operator's — same posture as the LSH lifecycle.
    */
  private val ensureLock = new Object

  def ensureAnnIndex(emb: DataFrame, kClusters: Int, iters: Int,
      codesTable: String, vecTable: String, centroidTable: String,
      buckets: Int = 8, basePath: Option[String] = None): Boolean =
    ensureLock.synchronized {
      val spark = emb.sparkSession
      Seq(codesTable, vecTable, centroidTable).foreach(Dedup.requireValidTable)
      val fresh = Seq(codesTable, vecTable, centroidTable)
        .forall(spark.catalog.tableExists) &&
        storedAnnParams(spark, codesTable)
          .contains(annParamsKey(kClusters, iters, buckets)) &&
        spark.table(vecTable).count() == emb.count()
      if (!fresh)
        writeAnnIndex(emb, kClusters, iters, codesTable, vecTable,
          centroidTable, buckets, basePath)
      !fresh
    }

  /** Probe the stored index, PQ path: stage 1 scans `codesTable`'s 2-byte
    * code column against the broadcast query codes (Hamming <= radius);
    * stage 2 fetches ONLY the shortlist's vectors from the vec_id-bucketed
    * `vecTable` and re-ranks by exact rounded cosine. Query set and output
    * shape match [[topKPqRerank]] (vec_id < nQueries; (q_id, rk, vec_id,
    * cos)) so the two paths share an oracle.
    */
  def probePqIndex(spark: org.apache.spark.sql.SparkSession, nQueries: Int,
      k: Int, radius: Int, codesTable: String, vecTable: String): DataFrame = {
    Seq(codesTable, vecTable).foreach(Dedup.requireValidTable)
    val vecs = spark.table(vecTable)
    val q = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), pqCode(col("embedding")).as("q_code"))
    val shortlist = spark.table(codesTable).join(broadcast(q),
        col("vec_id") =!= col("q_id") &&
          expr("bit_count(pq_code ^ q_code)") <= radius)
      .select(col("q_id"), col("vec_id"), col("q_emb"), col("q_nrm"))
    val scored = shortlist.join(vecs.select(col("vec_id"), col("embedding"),
        col("nrm")), "vec_id")
      .select(col("q_id"), col("vec_id"),
        Det.rdet(dot(col("embedding"), col("q_emb")) /
          (col("nrm") * col("q_nrm")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "cos")
  }

  /** Probe the stored index, IVF path: nearest `nprobe` STORED centroids
    * per query (no re-train), candidates from the cluster-bucketed
    * `codesTable`, exact re-rank off `vecTable`. Output shape matches
    * [[topKIvfMultiprobe]]: (q_id, rk, vec_id, d2).
    */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession, nQueries: Int,
      k: Int, nprobe: Int, codesTable: String, vecTable: String,
      centroidTable: String): DataFrame = {
    Seq(codesTable, vecTable, centroidTable).foreach(Dedup.requireValidTable)
    val vecs = spark.table(vecTable)
    val centroids = spark.table(centroidTable)
    val wq = Window.partitionBy("vec_id").orderBy(col("d2"), col("cluster"))
    val probes = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", KMeans.d2Col)
      .withColumn("rkc", row_number().over(wq))
      .filter(col("rkc") <= nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cluster"))
    val cands = spark.table(codesTable).join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("vec_id"))
    val pairD2 = dot(col("embedding"), col("embedding")) -
      lit(2.0d) * dot(col("embedding"), col("q_emb")) +
      dot(col("q_emb"), col("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("vec_id"))
    cands.join(vecs.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("d2", Det.rdet(pairD2, 6))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "vec_id", "d2")
  }

  /** Index lifecycle, commit verb ([[Dedup.appendLshIndex]]'s shape): a
    * NEW vector batch is assigned to the EXISTING stored centroids (append
    * never re-trains — quantizer drift is a periodic-rebuild concern, by
    * contract) and appended bucket-aligned to both tables. Cost tracks the
    * batch size only; history is never read.
    */
  def appendAnnIndex(newVecs: DataFrame, codesTable: String,
      vecTable: String, centroidTable: String, buckets: Int = 8): Unit = {
    val spark = newVecs.sparkSession
    Seq(codesTable, vecTable, centroidTable).foreach(Dedup.requireValidTable)
    val centroids = spark.table(centroidTable)
    val nv = newVecs.select(col("vec_id"), col("embedding")).persist()
    try {
      KMeans.assignments(nv, centroids)
        .select(col("vec_id"), col("cluster"),
          pqCode(col("embedding")).as("pq_code"))
        .repartition(buckets, col("cluster"))
        .write.format("parquet").mode("append")
        .bucketBy(buckets, "cluster").sortBy("cluster")
        .saveAsTable(codesTable)
      withNorm(nv)
        .repartition(buckets, col("vec_id"))
        .write.format("parquet").mode("append")
        .bucketBy(buckets, "vec_id").sortBy("vec_id")
        .saveAsTable(vecTable)
    } finally nv.unpersist()
  }

  /** Embedding near-duplicate pairs within a coarse partition: label-blocked
    * pairwise cosine above `threshold`. doc pairs ordered (a < b). The
    * normed table is cached so per-vector work runs once, not per pair.
    */
  def embeddingDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val c = withNorm(emb.select(col("vec_id"), col("label"), col("embedding"))).transform(ScopedCache.cache)
    c.as("a").join(c.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Det.rdet(dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023 — public paper):
    * embedding-space dedup blocked by a TRAINED coarse quantizer. The
    * corpus clusters under [[KMeans]] (2 Lloyd rounds), pairs are scored
    * only within a cluster, and a vector is dropped when any lower-id
    * cluster-mate sits at rounded cosine ≥ `threshold` (keep-first, one
    * anti-join, no iteration). Output: (vec_id, cluster, kept).
    *
    * SCALE PARAMETERS (the round-13 verdict's ask — a pinned k exercises
    * none of the Σc² posture):
    *
    *  - `targetClusterSize` derives k from the CORPUS SIZE:
    *    k = max(4, ⌈n / targetClusterSize⌉), so within-cluster pair mass
    *    Σ c² stays ~ n·targetClusterSize as the corpus grows instead of
    *    n² — the published SemDeDup recipe's own scaling rule.
    *  - `maxDominators` caps the DOMINATOR side per cluster (the
    *    `maxDominators` lowest-id members): a pathologically imbalanced
    *    Lloyd fit cannot regrow a quadratic cluster — per-cluster pair
    *    mass is ≤ maxDominators·|c|, linear in |c|. The cap is NEVER
    *    silent: pass `drops` and the count of excluded dominators (and
    *    total vectors) rides the output job as an `observe` metric —
    *    no second scan. Capping only weakens dominance (a dropped
    *    dominator can only under-delete), it never fabricates a drop.
    *
    * The within-cluster rank uses a window PARTITIONED by cluster; the
    * k-scaling rule is precisely what bounds that partition's size.
    */
  def semanticDedup(emb: DataFrame, targetClusterSize: Int = 512,
      maxDominators: Int = 4096, threshold: Double = 0.35,
      drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val n = emb.count()
    val k = math.max(4L, (n + targetClusterSize - 1) / targetClusterSize).toInt
    val cents = KMeans.fitCentroids(emb, k, iters = 2)
    val af = KMeans.assignments(emb, cents)
      .withColumn("nrm", norm2(col("embedding")))
      .transform(ScopedCache.cache)
    val ranked = af.withColumn("rk", row_number().over(
      Window.partitionBy("cluster").orderBy("vec_id")))
    val observed = drops.map(o => ranked.observe(o,
      sum(when(col("rk") > maxDominators, 1L).otherwise(0L))
        .as("dominator_drops"),
      count(lit(1)).as("n_vectors"))).getOrElse(ranked)
    val dominators = observed.filter(col("rk") <= maxDominators)
      .select(col("vec_id").as("a_id"), col("cluster").as("a_cluster"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val dom = dominators.join(af,
        col("a_cluster") === col("cluster") &&
          col("a_id") < col("vec_id") &&
          Det.rdet(dot(col("a_emb"), col("embedding"))
            / (col("a_nrm") * col("nrm")), 6) >= threshold)
      .select(col("vec_id")).distinct()
      .withColumn("dom", lit(1))
    af.select(col("vec_id"), col("cluster"))
      .join(dom, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("dom").isNull, 1).otherwise(0).as("kept"))
  }
}
