package graft

/** The SQL front door: oracle texts are written in ANSI-leaning DuckDB SQL,
  * and a large subset is plain enough to run UNCHANGED through `spark.sql`
  * over temp views. Every such query must produce exactly the DataFrame
  * implementation's rows — a user of this library can query it in SQL, and
  * the two surfaces cannot drift apart.
  */
class SqlFrontDoorSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val viewsReady: Unit =
    Tables.names.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))

  /** Oracles that PARSE in Spark but intentionally mean something else
    * there: q93 uses DuckDB's dayofweek convention (0=Sunday) in the SQL,
    * which the Spark implementation maps explicitly (dayofweek(x)-1, since
    * Spark's is 1=Sunday) — running the DuckDB text in Spark is off by one
    * BY DESIGN (the dialect mapping is the query's point).
    */
  private val dialectExceptions = Set("q93_week_trunc")

  /** Core relational queries whose oracles MUST stay in the shared ANSI
    * subset — these may never silently drop out of the sweep (an edit that
    * makes one unparseable in Spark fails here BY NAME, not as a -1 in the
    * parsed count).
    */
  private val mustParse = Set(
    "q01_pricing_summary", "q04_nation_revenue", "q44_full_outer",
    "q59_group_having", "q60_in_subquery", "q95_exists",
    "q162_market_share")

  test("every Spark-parseable oracle returns exactly the DataFrame implementation's rows") {
    viewsReady
    val parsedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    val mismatches = scala.collection.mutable.ArrayBuffer.empty[String]
    queries.Registry.all.foreach { q =>
      q.oracle.filter(_ => !dialectExceptions(q.name)).foreach { sql =>
        // DuckDB-only constructs (list_*, //, epoch_us, ::casts) fail to
        // parse in Spark and are skipped; everything that parses must match
        val df = try Some(spark.sql(sql)) catch { case _: Throwable => None }
        df.foreach { d =>
          parsedNames += q.name
          val ok = try {
            d.collect().map(_.toSeq).toSeq ==
              q.run(spark, dir).collect().map(_.toSeq).toSeq
          } catch { case _: Throwable => false }
          if (!ok) mismatches += q.name
        }
      }
    }
    assert(mismatches.isEmpty, s"SQL front door diverges for: $mismatches")
    val missing = mustParse -- parsedNames.toSet
    assert(missing.isEmpty, s"core ANSI oracles no longer run in Spark: $missing")
    // regression guard at the CURRENT subset size: growing is fine, any
    // shrink is a deliberate dialect decision that must update this number
    assert(parsedNames.size >= 42,
      s"only ${parsedNames.size} oracles parsed in Spark (expected >= 42)")
  }
}
