package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, KMeans}

/** Unit coverage for the round-2 operators: as-of backward join semantics
  * (latest at-or-before, inclusive ties, no-match nulls) and the
  * deterministic k-means fit (separation, determinism, centroid movement).
  */
class AsofKmeansSpec extends SparkTestBase {
  import spark.implicits._

  test("asof backward: latest at-or-before, inclusive tie, null when none") {
    val probe = Seq(
      (1L, 5L, 100L),   // after builds at 1,4 -> picks t=4
      (1L, 4L, 101L),   // tie with build t=4 -> inclusive
      (1L, 0L, 102L),   // before all builds -> null
      (2L, 9L, 103L),   // other key: picks its own build, not key 1's
      (3L, 7L, 104L))   // key with no builds at all -> null
      .toDF("k", "t", "probe_id")
    val build = Seq(
      (1L, 1L, 10L), (1L, 4L, 11L), (2L, 2L, 12L))
      .toDF("k", "t", "payload")
    val out = AsofJoin.backward(probe, build, "k", "t", Seq("payload"))
      .orderBy("probe_id")
      .select("probe_id", "payload")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    assert(out == Seq(
      (100L, Some(11L)), (101L, Some(11L)), (102L, None),
      (103L, Some(12L)), (104L, None)))
  }

  test("asof backward equals the quadratic reference on random data") {
    val rnd = new scala.util.Random(42)
    val probe = Seq.tabulate(300)(i => (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
    // unique (key, time) build rows, as the operator contract requires
    val build = rnd.shuffle(
      (for { k <- 0L until 8L; t <- 0L until 50L } yield (k, t)).toSeq)
      .take(120).zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
    val want = probe.map { case (k, t, id) =>
      val eligible = build.filter(b => b._1 == k && b._2 <= t)
      id -> (if (eligible.isEmpty) None
             else Some(eligible.maxBy(_._2)._3))
    }.toMap
    val got = AsofJoin.backward(
        probe.toDF("k", "t", "probe_id"), build.toDF("k", "t", "payload"),
        "k", "t", Seq("payload"))
      .collect()
      .map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got == want)
  }

  test("kmeans separates two blobs and assigns every vector deterministically") {
    // vec_id 0 and 1 seed the two blobs (init = k lowest vec_ids)
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Seq(base + (i / 2) * 0.01f, base - (i / 2) * 0.01f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val fit1 = KMeans.fit(df, k = 2, iters = 2).orderBy("vec_id").collect()
    assert(fit1.length == 20)
    // blob membership: even ids -> cluster 0's blob, odd -> cluster 1's
    fit1.foreach { r =>
      val (id, cluster) = (r.getLong(0), r.getLong(1))
      assert(cluster == (if (id % 2 == 0) 0L else 1L), s"vec $id -> $cluster")
      assert(r.getDouble(2) >= 0.0)
    }
    val fit2 = KMeans.fit(df, k = 2, iters = 2).orderBy("vec_id").collect()
    assert(fit1.map(_.toSeq).toSeq == fit2.map(_.toSeq).toSeq)
  }

  test("kmeans centroids move off the seed vectors after an update") {
    // seeds at 0 and 100; the 0-blob's true mean is ~2 -> after one
    // iteration the seed vector is no longer at distance 0 of its centroid
    val rows = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(100.0f, 100.0f)),
      (2L, Seq(4.0f, 4.0f)), (3L, Seq(96.0f, 96.0f)))
    val fit = KMeans.fit(rows.toDF("vec_id", "embedding"), k = 2, iters = 1)
      .orderBy("vec_id").collect()
    assert(fit.map(_.getLong(1)).toSeq == Seq(0L, 1L, 0L, 1L))
    // centroid of cluster 0 is (2,2): both members at squared distance 8
    assert(fit(0).getDouble(2) == 8.0)
    assert(fit(2).getDouble(2) == 8.0)
  }
}
