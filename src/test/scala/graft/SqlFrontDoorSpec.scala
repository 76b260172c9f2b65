package graft

/** The SQL front door: for queries whose oracle text is plain ANSI SQL, the
  * SAME string the DuckDB gate runs must also run through `spark.sql` over
  * temp views and produce exactly the DataFrame implementation's rows — a
  * user of this library can query it in SQL, and the two surfaces cannot
  * drift apart.
  */
class SqlFrontDoorSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val viewsReady: Unit =
    Tables.names.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))

  /** Oracle SQL that is valid in both DuckDB and Spark SQL. */
  private val ansiQueries = Seq(
    "q01_pricing_summary", "q04_nation_revenue", "q44_full_outer",
    "q59_group_having", "q60_in_subquery", "q95_exists")

  ansiQueries.foreach { name =>
    test(s"$name: spark.sql(oracle text) == DataFrame implementation") {
      viewsReady
      val q = queries.Registry.all.find(_.name == name).get
      val fromApi = q.run(spark, dir).collect().map(_.toSeq).toSeq
      val fromSql = spark.sql(q.oracle.get).collect().map(_.toSeq).toSeq
      assert(fromApi == fromSql,
        s"DataFrame and spark.sql results diverge for $name")
    }
  }
}
