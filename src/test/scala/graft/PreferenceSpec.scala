package graft

import graft.operators.Preference

/** Bradley–Terry MM fit (q282): closed-form small cases, ordering
  * invariants, and the winless-item clamp.
  */
class PreferenceSpec extends SparkTestBase {

  private def fit(rows: Seq[(String, String, Long)], iters: Int) = {
    import spark.implicits._
    Preference.bradleyTerry(
      rows.toDF("winner", "loser", "cnt"), iters)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("two items: one MM round reproduces the closed-form integer update") {
    // A beats B 3 times, B beats A once: W_A=3, W_B=1, n=4
    // denom = (4 · S²) intdiv (S + S) = 2S; w' = W · S² intdiv 2S = W·S/2
    val st = fit(Seq(("A", "B", 3L), ("B", "A", 1L)), iters = 1)
    val S = Preference.Scale
    assert(st("A") === ((3L, 4L, 3L * S / 2)))
    assert(st("B") === ((1L, 4L, 1L * S / 2)))
  }

  test("symmetric records fit equal strengths; lopsided records order them") {
    val even = fit(Seq(("A", "B", 5L), ("B", "A", 5L)), iters = 5)
    assert(even("A")._3 === even("B")._3)
    val skew = fit(Seq(("A", "B", 9L), ("B", "A", 1L)), iters = 5)
    assert(skew("A")._3 > skew("B")._3)
  }

  test("a transitive tournament fits monotone strengths") {
    val st = fit(Seq(
      ("A", "B", 8L), ("B", "A", 2L),
      ("B", "C", 8L), ("C", "B", 2L),
      ("A", "C", 9L), ("C", "A", 1L)), iters = 5)
    assert(st("A")._3 > st("B")._3 && st("B")._3 > st("C")._3)
    assert(st("A")._1 === 17L) // wins
    assert(st("A")._2 === 20L) // comparisons
  }

  test("a winless item clamps to strength 1, never zeroing a denominator") {
    val st = fit(Seq(("A", "B", 4L)), iters = 3)
    assert(st("B")._3 === 1L)
    assert(st("A")._3 >= 1L)
  }
}
