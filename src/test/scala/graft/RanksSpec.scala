package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** The distributed global-rank operator: exact row numbers and ntile
  * assignments against single-partition window references, invariance under
  * partition count, and the no-single-partition-window plan property.
  */
class RanksSpec extends SparkTestBase {
  import spark.implicits._

  private def randomDf(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // duplicate-heavy value column; id is the unique tiebreaker
    Seq.tabulate(n)(i => (rnd.nextInt(20).toLong, i.toLong))
      .toDF("v", "id")
      .repartition(7) // uneven, deliberately unrelated to the sort
  }

  test("globalRowNumber matches the single-partition window reference") {
    val df = randomDf(500, 1)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))
    val want = df.withColumn("i", row_number().over(w).cast("long"))
      .select("id", "i").as[(Long, Long)].collect().toMap
    val got = Ranks.globalRowNumber(df, Seq(col("v"), col("id")), "i")
      .select("id", "i").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalRowNumber is invariant under shuffle partition count") {
    def run(parts: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Ranks.globalRowNumber(randomDf(500, 2), Seq(col("v"), col("id")), "i")
        .select("id", "i").as[(Long, Long)].collect().toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("3") == run("16"))
  }

  test("globalNtile matches ntile() for sizes straddling the tile count") {
    for (n <- Seq(7, 10, 503); k <- Seq(4, 10)) {
      val df = randomDf(n, n * 31 + k)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))
      val want = df.withColumn("t", ntile(k).over(w))
        .select("id", "t").as[(Long, Int)].collect().toMap
      val got = Ranks.globalNtile(df, Seq(col("v"), col("id")), k, "t")
        .select("id", "t").as[(Long, Int)].collect().toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("plan contains no empty-partition-spec window") {
    val plan = Ranks.globalRowNumber(randomDf(50, 3), Seq(col("v"), col("id")), "i")
      .queryExecution.executedPlan
    val bad = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"single-partition windows in plan: $bad")
  }

  test("groupedRowNumber matches per-group window reference") {
    val df = randomDf(600, 5).withColumn("g", (col("id") % 3).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v"), col("id"))
    val want = df.withColumn("i", row_number().over(w).cast("long"))
      .select("id", "i").as[(Long, Long)].collect().toMap
    val got = Ranks.groupedRowNumber(df, Seq(col("g")), Seq(col("v"), col("id")), "i")
      .select("id", "i").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("selectByRank picks exactly the window-reference element at ceil(n/2)") {
    val df = randomDf(601, 9).withColumn("g", (col("id") % 3).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v"), col("id"))
    val want = df.withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("i") === floor((col("n") + 1L) / 2L).cast("long"))
      .select("g", "id", "i").as[(String, Long, Long)].collect().toSet
    val got = graft.operators.Ranks.selectByRank(df, Seq(col("g")),
        Seq(col("v"), col("id")), n => floor((n + 1L) / 2L).cast("long"), "i")
      .select("g", "id", "i").as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.size == 3) // one selected row per group
  }

  test("interpolatedPercentiles matches the percentile() aggregate it replaced") {
    // the single-reducer ObjectHashAggregate form retired from the query
    // surface (q41/q78) lives on HERE as the correctness reference: the
    // distributed-selection path must reproduce SQL quantile_cont exactly
    // (double-for-double — both interpolate lo + frac*(hi - lo))
    val df = randomDf(601, 23).withColumn("g", (col("id") % 3).cast("string"))
      .withColumn("x", col("v") * 1.25 + col("id") % 7)
    val want = df.groupBy("g")
      .agg(expr("percentile(x, 0.5)").as("p50"), expr("percentile(x, 0.9)").as("p90"))
      .select("g", "p50", "p90").as[(String, Double, Double)].collect().toSet
    val got = Ranks.interpolatedPercentiles(df.cache(), Seq("g"), col("x"),
        Seq(col("id")), Seq(0.5 -> "p50", 0.9 -> "p90"))
      .select("g", "p50", "p90").as[(String, Double, Double)].collect().toSet
    assert(got == want)
    // grand-total grouping (groups = empty) also matches
    val want0 = df.agg(expr("percentile(x, 0.25)")).head().getDouble(0)
    val got0 = Ranks.interpolatedPercentiles(df, Seq.empty, col("x"),
      Seq(col("id")), Seq(0.25 -> "p25")).head().getDouble(0)
    assert(got0 == want0)
  }

  test("property: interpolatedPercentiles bit-equals percentile() over 500 random groups") {
    // ScalaCheck-generated corpus: group sizes 1..40, values mixing a
    // continuous range with a tiny duplicate-heavy pool, percentiles
    // including the extremes p=0 and p=1 — all 500 cases evaluated in ONE
    // distributed pass and compared double-for-double against the built-in
    // percentile() aggregate (allowed here: the PlanSpec ban covers
    // registered queries, and this single-reducer form is exactly the
    // correctness reference the distributed path must reproduce).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase: Gen[List[Double]] = for {
      n <- Gen.choose(1, 40)
      vals <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-1e6, 1e6),
        Gen.choose(0, 7).map(_.toDouble))) // duplicate-heavy pool
    } yield vals
    val cases = (0 until 500).map { i =>
      i -> genCase.pureApply(Gen.Parameters.default, Seed(20260814L + i))
    }
    assert(cases.exists(_._2.size == 1) &&
      cases.exists(c => c._2.size != c._2.distinct.size),
      "corpus must include singleton groups and duplicated values")
    val rows = cases.flatMap { case (g, vs) =>
      vs.zipWithIndex.map { case (v, j) => (g, j.toLong, v) }
    }
    val df = rows.toDF("g", "id", "x").repartition(4).cache()
    val ps = Seq(0.0 -> "p0", 0.07 -> "p07", 0.5 -> "p50", 0.77 -> "p77", 1.0 -> "p100")
    val builtin = df.groupBy("g")
      .agg(expr("percentile(x, 0.0)").as("p0"), expr("percentile(x, 0.07)").as("p07"),
        expr("percentile(x, 0.5)").as("p50"), expr("percentile(x, 0.77)").as("p77"),
        expr("percentile(x, 1.0)").as("p100"))
      .collect().map(r => r.getInt(0) -> (1 to 5).map(r.getDouble)).toMap
    val got = Ranks.interpolatedPercentiles(df, Seq("g"), col("x"),
        Seq(col("id")), ps)
      .collect().map(r => r.getInt(0) -> (1 to 5).map(r.getDouble)).toMap
    assert(got.keySet == builtin.keySet && got.keySet.size == 500)
    cases.foreach { case (g, vs) =>
      // BIT equality against the quantile_cont formula the operator (and
      // the DuckDB oracle behind q41/q78/q161/q181) defines: pos =
      // p*(n-1); lo + (pos - floor(pos)) * (hi - lo) over the sorted values
      val sorted = vs.sorted.toIndexedSeq
      val ref = ps.map { case (p, _) =>
        val pos = p * (sorted.size - 1)
        val lo = sorted(pos.toInt)
        val hi = sorted(math.min(pos.toInt + 1, sorted.size - 1))
        lo + (pos - math.floor(pos)) * (hi - lo)
      }
      assert(got(g).map(java.lang.Double.doubleToLongBits) ==
        ref.map(java.lang.Double.doubleToLongBits),
        s"group $g (${vs.size} rows): ${got(g)} vs $ref")
      // Spark's built-in percentile() interpolates as (ceil-pos)*lo +
      // (pos-floor)*hi — algebraically the same but NOT bitwise: the
      // quantile_cont form's (hi - lo) cancellation scales its rounding to
      // the NEIGHBOR SPAN, so the two can differ by several ulps of the
      // result when lo and hi are large and of opposite sign (this
      // property run is what measured that — first seen at case 0 p=0.77,
      // then 6 ulps at case 30). Assert the span-scaled envelope; the
      // bit-level contract above (vs the operator's own defined formula,
      // which the DuckDB oracle enforces at data scale) is the real pin.
      got(g).zip(builtin(g)).zipWithIndex.foreach { case ((a, b), i) =>
        val pos = ps(i)._1 * (sorted.size - 1)
        val lo = sorted(pos.toInt)
        val hi = sorted(math.min(pos.toInt + 1, sorted.size - 1))
        val tol = 16 * Math.ulp(math.max(lo.abs, hi.abs) + 1.0)
        assert(math.abs(a - b) <= tol,
          s"group $g ${ps(i)._2}: $a vs builtin $b past span envelope $tol")
      }
    }
  }

  test("selectByWeightedRank picks the window-reference weighted median") {
    val rnd2 = new scala.util.Random(17)
    val df = Seq.tabulate(700)(i =>
        (rnd2.nextInt(30).toLong, i.toLong, 1L + rnd2.nextInt(9)))
      .toDF("v", "id", "w").repartition(5)
      .withColumn("g", (col("id") % 3).cast("string"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // NB: the total-weight column must NOT be named "W" — withColumn
    // resolves case-insensitively and would silently REPLACE "w"
    val want = df
      .withColumn("cw", sum(col("w")).over(ws))
      .withColumn("wtot", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .withColumn("t", floor((col("wtot") + 1L) / 2L).cast("long"))
      .filter(col("cw") - col("w") < col("t") && col("t") <= col("cw"))
      .select("g", "id", "cw").as[(String, Long, Long)].collect().toSet
    val got = graft.operators.Ranks.selectByWeightedRank(df, Seq(col("g")),
        Seq(col("v"), col("id")), col("w"),
        wTot => floor((wTot + 1L) / 2L).cast("long"), "cw")
      .select("g", "id", "cw").as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.size == 3)
  }

  // Regression: the pid-offset formulation (rounds 3–4.0) produced silently
  // wrong, run-to-run-varying ranks when the input was itself a broadcast
  // join (the offsets subtree materialized its own copy of the range
  // exchange with differently-sampled boundaries). The bucket formulation
  // must be exact over join-produced inputs, on EVERY evaluation.
  test("ranks over a join-produced input are exact across repeated evaluations") {
    val df = randomDf(500, 7).withColumn("g", (col("id") % 2).cast("string"))
    val dim = df.groupBy("g").agg(avg(col("v")).as("m"))
    val joined = df.join(broadcast(dim), "g")
      .withColumn("d", abs(col("v") - col("m")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("d"), col("id"))
    val want = joined.withColumn("i", row_number().over(w).cast("long"))
      .select("id", "i").as[(Long, Long)].collect().toMap
    val ranked = Ranks.groupedRowNumber(joined, Seq(col("g")),
      Seq(col("d"), col("id")), "i")
    for (_ <- 1 to 3) {
      val got = ranked.select("id", "i").as[(Long, Long)].collect().toMap
      assert(got == want)
    }
  }

  test("globalCumSum matches the single-partition window reference, multi-column") {
    val df = randomDf(500, 11)
      .withColumn("a", (col("id") % 5 + 1).cast("long"))
      .withColumn("b", (col("id") % 3).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .select("id", "ca", "cb").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val got = Ranks.globalCumSum(df, Seq(col("v"), col("id")),
        Seq(col("a") -> "ca", col("b") -> "cb"))
      .select("id", "ca", "cb").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want)
    // and its plan never funnels the data through an empty-partition window
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = Ranks.globalCumSum(df, Seq(col("v"), col("id")),
      Seq(col("a") -> "ca")).queryExecution.executedPlan
    val bad = plan.collect { case we: WindowExec if we.partitionSpec.isEmpty => we }
    assert(bad.isEmpty, s"unpartitioned WindowExec: $bad")
  }
}
