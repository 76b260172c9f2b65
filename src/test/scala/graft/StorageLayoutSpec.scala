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

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // engine-native bloom-join: InjectRuntimeFilter builds a bloom filter
    // from the selective (filtered) side and applies it map-side on the
    // probe side before the shuffle — at 100 TB this is the difference
    // between shuffling the fact table and shuffling the survivors. The
    // size thresholds exist for real lakes; lowered here so the pattern
    // fires on test data.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.expectedNumItems", "1000")
    // InjectRuntimeFilter pattern-matches scans under the join; the
    // small-scan rebalance Repartition would hide them
    s2.conf.set("spark.graft.repartitionSmallScans", "false")
    val l = Tables.load(s2, "/root/testdata/sf0.001", "lineitem")
    val p = Tables.load(s2, "/root/testdata/sf0.001", "part")
      .filter(col("p_type") === "PROMO")
    val j = l.join(p, col("l_partkey") === col("p_partkey"))
    val plan = j.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"), plan)
    val expect = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .join(Tables.load(spark, "/root/testdata/sf0.001", "part")
        .filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey")).count()
    assert(j.count() == expect && expect > 0)
  }

  test("zorder16 matches the reference interleave and clusters both dimensions") {
    import graft.functions.Layout
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 16), rnd.nextInt(1 << 16)))
    val got = pts.toDF("x", "y")
      .select(Layout.zorder16(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    val want = pts.map { case (x, y) => Layout.zorder16Ref(x, y) }
    assert(got.toSeq == want)
    // layout property: sort 0..255 x 0..255 grid by zkey, cut into files of
    // 4096 rows -> every file's x AND y span stay bounded (<= 64 for a
    // perfectly aligned curve), which is what lets parquet min/max prune 2-D
    // range predicates; a rowmajor sort gives y-span 255 in every file
    val grid = for { x <- 0 until 256; y <- 0 until 256 } yield (x, y)
    val byZ = grid.sortBy { case (x, y) => Layout.zorder16Ref(x, y) }
    byZ.grouped(4096).foreach { file =>
      val xs = file.map(_._1)
      val ys = file.map(_._2)
      assert(xs.max - xs.min <= 64 && ys.max - ys.min <= 64)
    }
  }

  test("hilbert key matches the reference walk and every unit step is adjacent") {
    import graft.functions.Layout
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(300)((rnd.nextInt(256), rnd.nextInt(256)))
    val got = Layout.withHilbert(pts.toDF("x", "y"), 8, "x", "y", "hd")
      .select("x", "y", "hd").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pts.foreach { p => assert(got(p) == Layout.hilbertRef(8, p._1, p._2), p) }
    // the defining Hilbert property (which Morton lacks): consecutive curve
    // positions are always 4-neighbor adjacent cells
    val byD = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (Layout.hilbertRef(6, x, y), (x, y))).sortBy(_._1)
    assert(byD.map(_._1) == (0L until 4096L))
    byD.map(_._2).sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"($x1,$y1)->($x2,$y2)")
    }
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

  test("parquet bloom filters: written per column option, functional in the footer") {
    // the point-lookup accelerator for high-cardinality non-sorted columns
    // (min/max pruning is useless when every row group spans the domain):
    // write with the column-scoped bloom options, then assert FUNCTIONALLY
    // against the file's own footer via parquet-mr — the filter exists for
    // the enabled column only, contains every written key, and excludes
    // most absent ones (the property row-group skipping keys off).
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("bloom").toString
    spark.range(5000).select(
        (col("id") * 2654435761L % 1000003L).as("k"), // high-cardinality, unsorted
        col("id").as("v"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "10000")
      .parquet(s"$dir/t")
    val file = new java.io.File(s"$dir/t").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val cols = block.getColumns.asScala
      val kMeta = cols.find(_.getPath.toDotString == "k").get
      val vMeta = cols.find(_.getPath.toDotString == "v").get
      assert(kMeta.getBloomFilterOffset >= 0, "bloom missing on enabled column")
      assert(vMeta.getBloomFilterOffset < 0, "bloom present on disabled column")
      val bf = reader.getBloomFilterDataReader(block).readBloomFilter(kMeta)
      assert(bf != null)
      val written = (0L until 5000L).map(i => i * 2654435761L % 1000003L).toSet
      written.foreach(k => assert(bf.findHash(bf.hash(k)), s"written key $k absent"))
      // absent keys: the filter must say no for MOST (fpp is ~1% at this ndv)
      val absent = (1000004L to 1000103L).filterNot(written)
      val falsePos = absent.count(k => bf.findHash(bf.hash(k)))
      assert(falsePos < absent.size / 4,
        s"$falsePos/${absent.size} false positives — filter not functional")
    } finally reader.close()
  }

  test("compressed-ingest dump is memoized: a second call skips the rewrite") {
    val sf = "/root/testdata/sf0.001"
    assert(graft.sources.CompressedIngest
      .documentsRoundTrip(spark, sf, "gzip").count() > 0)
    val dir = new java.io.File(
      graft.sources.CompressedIngest.dumpPath(sf, "json_gzip"))
    val stamps = dir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    Thread.sleep(1100) // cross mtime resolution
    assert(graft.sources.CompressedIngest
      .documentsRoundTrip(spark, sf, "gzip").count() > 0)
    val again = dir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(again == stamps, "second call rewrote the memoized dump")
  }

  test("parquet + zstd: every column chunk carries the ZSTD codec (footer-observed)") {
    import scala.jdk.CollectionConverters._
    val sf = "/root/testdata/sf0.001"
    val df = graft.sources.CompressedIngest.documentsParquet(spark, sf, "zstd")
    assert(df.count() > 0)
    val dir = new java.io.File(
      graft.sources.CompressedIngest.dumpPath(sf, "parquet_zstd"))
    val file = dir.listFiles().find(_.getName.endsWith(".parquet")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val codecs = reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala).map(_.getCodec.toString).toSet
      assert(codecs == Set("ZSTD"), s"footer codecs: $codecs")
    } finally reader.close()
  }

  test("orc + zstd: the file's own footer declares ZSTD compression") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.sources.CompressedIngest.documentsOrc(spark, sf, "zstd")
    assert(df.count() > 0)
    val dir = new java.io.File(
      graft.sources.CompressedIngest.dumpPath(sf, "orc_zstd"))
    val file = dir.listFiles().find(_.getName.endsWith(".orc")).get
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      org.apache.orc.OrcFile.readerOptions(spark.sparkContext.hadoopConfiguration))
    try {
      assert(reader.getCompressionKind.toString == "ZSTD",
        s"orc footer codec: ${reader.getCompressionKind}")
      assert(reader.getNumberOfRows > 0)
    } finally reader.close()
  }

  test("bzip2 text shards split at read; the same file as gzip is ONE split") {
    // The SCALE.md compressed-text claim, observed: bzip2's block structure
    // is splittable (Hadoop aligns range splits to 100 KB compression
    // blocks), so ONE large .bz2 file still reads in parallel — while the
    // same bytes as .gz are forced into a single task no matter the size.
    val dir = Files.createTempDirectory("codec").toString
    // ~15 MB of incompressible-ish JSON lines => a few MB compressed,
    // i.e. dozens of bzip2 blocks
    val docs = spark.range(120000).select(col("id"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1000000).cast("string"))).as("text"))
    docs.coalesce(1).write.mode("overwrite")
      .option("compression", "bzip2").json(s"$dir/bz")
    docs.coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").json(s"$dir/gz")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", "262144") // 256 KB ranges
    s2.conf.set("spark.sql.files.openCostInBytes", "0")
    val schema = "id LONG, text STRING"
    val bz = s2.read.schema(schema).json(s"$dir/bz")
    val gz = s2.read.schema(schema).json(s"$dir/gz")
    assert(gz.rdd.getNumPartitions == 1, "gzip must be one split per file")
    assert(bz.rdd.getNumPartitions > 1,
      s"bzip2 read planned ${bz.rdd.getNumPartitions} splits")
    // the splits genuinely decode in parallel (several nonempty partitions)
    // and lose nothing: counts and a content checksum survive the split read
    val perPart = bz.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) >= 2, perPart.mkString(","))
    assert(perPart.sum == 120000)
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(crc32(col("text"))), sum(col("id"))).collect()(0)
    assert(sig(bz) == sig(docs.toDF("id", "text")))
  }
}
