package graft

import org.apache.spark.sql.SparkSession

/** Config invariance as a FIRST-CLASS spec (formerly manual env sweeps via
  * SPARK_GRAFT_CONF): a deterministic sample of the registered query
  * surface re-runs under each perturbed configuration in-process, and
  * every result must equal the baseline session's row-for-row. The three
  * perturbations cover the classes of config dependence that have bitten
  * real engines: partition-count/plan-shape (shuffle=4 + AQE off), the
  * interpreted expression paths (whole-stage codegen off — every native
  * expression's eval() instead of doGenCode()), and the optimizer-rule
  * overlay (GraftExtensions' range-join rewrite + SQL function
  * registration installed).
  *
  * The sample is every 10th query by sorted name PLUS pinned anchors for
  * the operators with custom plan machinery (the flagship + bucketed
  * noise pair, LSH, the prefix/containment joins' native intersect, the
  * round-10 media probes). Sample size is asserted and recorded in
  * NOTES.md so a silent registry drift cannot hollow the spec out.
  */
class ConfigInvarianceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private val anchors = Seq(
    "q19_noise_flagship", "q20_noise_bucketed", "q26_dedup_minhash_lsh",
    "q33_knn_brute", "q121_substring_dedup",
    "q134_setsim_prefix", "q165_containment", "q215_dup_span_removal",
    "q226_mp4_probe", "q227_adpcm_stereo")

  private val sampled: Seq[String] = {
    val names = queries.Registry.all.map(_.name).sorted
    val missing = anchors.filterNot(names.contains)
    assert(missing.isEmpty, s"anchor queries gone from the registry: $missing")
    (names.zipWithIndex.collect { case (n, i) if i % 10 == 0 => n } ++ anchors)
      .distinct.sorted
  }

  /** Order-insensitive row fingerprint of one query under one session. */
  private def rows(s: SparkSession, name: String): Seq[String] =
    SparkEntry.queries(name)(s, sfDir).collect()
      .map(_.toString).sorted.toSeq

  private lazy val baseline: Map[String, Seq[String]] = {
    assert(sampled.size >= 28, s"sample shrank to ${sampled.size} — registry drift?")
    sampled.map(n => n -> rows(spark, n)).toMap
  }

  private def assertInvariant(s2: SparkSession, label: String): Unit =
    sampled.foreach { n =>
      assert(rows(s2, n) == baseline(n), s"$n diverged under $label")
    }

  test(s"sampled surface is invariant under shuffle=4 + AQE off " +
    s"(${28}+ queries)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    assertInvariant(s2, "shuffle=4, AQE off")
  }

  test("sampled surface is invariant with whole-stage codegen off " +
    "(interpreted eval of every native expression)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    assertInvariant(s2, "codegen off")
  }

  test("sampled surface is invariant with GraftExtensions installed " +
    "(range-join rewrite + native function registration)") {
    val s2 = spark.newSession()
    GraftExtensions.installInto(s2)
    assertInvariant(s2, "extensions on")
  }
}
