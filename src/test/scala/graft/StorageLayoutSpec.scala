package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale techniques: hive-style partitioned writes with
  * partition pruning at read, and bucketed tables giving shuffle-free
  * co-located joins (SURVEY.md §7.5 scale posture: "bucketing for co-located
  * joins").
  */
class StorageLayoutSpec extends SparkTestBase {

  test("partitionBy write + filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("part").toString
    Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(s"$dir/orders_by_yr")
    val pruned = spark.read.parquet(s"$dir/orders_by_yr").filter(col("yr") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan)
    val expect = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() == expect && expect > 0)
  }

  test("bucketed tables join without an exchange") {
    val s2 = spark.newSession() // isolated conf; shares the temp warehouse
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val o = Tables.load(s2, "/root/testdata/sf0.001", "orders")
    val l = Tables.load(s2, "/root/testdata/sf0.001", "lineitem")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val joined = s2.table("orders_b").join(s2.table("lineitem_b"),
      col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join needs no shuffle on either side
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() ==
      o.join(l, col("o_orderkey") === col("l_orderkey")).count())
  }
}
