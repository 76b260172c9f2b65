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
}
