package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Misra–Gries heavy hitters: the candidate superset guarantee on a skewed
  * stream whose cardinality far exceeds the counter budget, and exactness of
  * the sketch-then-verify result against the full GROUP BY.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish stream: item i appears ~ n/(i+1) times, plus a long tail of
    * singletons — cardinality >> k so the sketch must evict constantly.
    */
  private def skewed(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = Seq.tabulate(n) { _ =>
      val r = rnd.nextDouble()
      if (r < 0.5) s"hot${rnd.nextInt(5)}" // 5 hot items share half the mass
      else if (r < 0.7) s"warm${rnd.nextInt(50)}"
      else s"tail${rnd.nextInt(100000)}" // mostly-unique tail
    }
    rnd.shuffle(rows).toDF("item").repartition(7)
  }

  test("candidates are a superset of the true heavy hitters") {
    val df = skewed(20000, 11)
    val k = 20
    val truth = df.groupBy("item").agg(count(lit(1)).as("c"))
      .crossJoin(df.groupBy().agg(count(lit(1)).as("n")))
      .filter(col("c") * k > col("n"))
      .select("item").as[String].collect().toSet
    assert(truth.nonEmpty, "fixture must contain heavy hitters")
    val cand = Sketches.heavyHitterCandidates(df, col("item"), k)
      .as[String].collect().toSet
    assert(truth.subsetOf(cand),
      s"missing from candidates: ${truth -- cand}")
    // the candidate set stays sketch-sized, nowhere near full cardinality
    val distinct = df.distinct().count()
    assert(cand.size < distinct / 10,
      s"candidate set ${cand.size} too close to full cardinality $distinct")
  }

  test("sketch-then-verify equals the exact GROUP BY + HAVING") {
    val df = skewed(20000, 13)
    for (k <- Seq(10, 30)) {
      val want = df.groupBy("item").agg(count(lit(1)).as("cnt"))
        .crossJoin(df.groupBy().agg(count(lit(1)).as("n")))
        .filter(col("cnt") * k > col("n"))
        .select("item", "cnt").as[(String, Long)].collect().toMap
      val got = Sketches.heavyHitters(df, col("item"), k)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"k=$k")
    }
  }

  test("single-partition degenerate stream and nulls") {
    val df = (Seq.fill(99)(Some("a")) ++ Seq.fill(5)(None) ++ Seq.fill(1)(Some("b")))
      .toDF("item").coalesce(1)
    val got = Sketches.heavyHitters(df, col("item"), 2)
      .as[(String, Long)].collect().toMap
    // nulls are excluded; "a" holds 99 of 100 non-null rows
    assert(got == Map("a" -> 99L))
  }
}
