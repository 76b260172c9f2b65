package graft

import org.apache.spark.sql.functions._

import graft.plans.{SortedLongArrayIntersectCount, VectorDotProduct}

/** Equivalence guards for the native expressions: they must produce exactly
  * the values of the declarative forms they replace, under both whole-stage
  * codegen and the interpreted path (nullSafeEval), including nulls and
  * degenerate inputs.
  */
class ExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("sorted_intersect_count equals size(array_intersect) on random sorted sets") {
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      SortedLongArrayIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("sorted_intersect_count: nulls propagate, empty arrays count zero") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L))),
      (Some(Seq(1L, 2L)), Some(Seq(1L, 2L))))
      .toDF("a", "b")
      .select(SortedLongArrayIntersectCount(col("a"), col("b")).as("c"))
      .collect()
    assert(df(0).isNullAt(0))
    assert(df(1).getInt(0) == 0)
    assert(df(2).getInt(0) == 2)
  }

  test("vector_dot is bit-identical to the declarative zip_with fold") {
    val rows = Seq.fill(100)(
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val declarative = aggregate(
      zip_with(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double")),
        (x, y) => x * y),
      lit(0.0d), (s, x) => s + x)
    val df = rows.toDF("a", "b").select(
      VectorDotProduct(col("a"), col("b")).as("fast"), declarative.as("ref"))
    // exact bit equality, not tolerance — the oracle contract depends on it
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("vector_dot: length mismatch yields null under codegen and interpreted eval") {
    // a truncated embedding must never score as a plausible cosine
    val rows = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f)),      // mismatched
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))            // matched
    val codegen = rows.toDF("a", "b")
      .select(VectorDotProduct(col("a"), col("b")).as("d")).collect()
    assert(codegen(0).isNullAt(0))
    assert(codegen(1).getDouble(0) == 11.0)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val interp = rows.toDF("a", "b")
      .select(VectorDotProduct(col("a"), col("b")).as("d")).collect()
    assert(interp(0).isNullAt(0))
    assert(interp(1).getDouble(0) == 11.0)
  }

  test("native expressions agree with codegen disabled (interpreted eval path)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val df = Seq((Seq(1L, 3L, 5L), Seq(3L, 4L, 5L), Seq(1.0f, 2.0f), Seq(0.5f, 0.25f)))
      .toDF("a", "b", "x", "y")
      .select(
        SortedLongArrayIntersectCount(col("a"), col("b")).as("c"),
        VectorDotProduct(col("x"), col("y")).as("d"))
      .head()
    assert(df.getInt(0) == 2)
    assert(df.getDouble(1) == 1.0)
  }

  test("installInto registers the native functions for SQL on an existing session") {
    GraftExtensions.installInto(spark)
    try {
      val r = spark.sql(
        """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS c
          |""".stripMargin).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getInt(1) == 2)
    } finally {
      // the session is shared across suites: leave no optimizer rule behind
      // (sibling specs assert rewrite-free plan shapes)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.BucketedRangeJoinRule)
    }
  }
}
