package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStreaming

/** Structured Streaming tests: the tumbling-window aggregation over a
  * MemoryStream must agree with its batch-form run on the same rows, and the
  * mapGroupsWithState running totals must accumulate across micro-batches.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private val rows = Seq(
    (1L, ts(0), 10L, "click", 1.0, "{}"),
    (2L, ts(1), 10L, "click", 2.0, "{}"),
    (3L, ts(6), 11L, "view", 4.0, "{}"),
    (4L, ts(7), 10L, "click", 8.0, "{}"))

  private def toDF(rs: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    rs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("streaming tumbling counts equal the batch run of the same transform") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.startTumbling(
      mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "memory", "tumbling_test")
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy("window_start", "event_type").collect()
      val batch = EventsStreaming.tumblingCounts(toDF(rows))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.toSeq == batch.toSeq)
      // base epoch isn't 5-min aligned: minutes 0,1 share a window; 6 and 7
      // land in two different windows
      assert(batch.length == 3)
      val w0 = batch(0)
      assert(w0.getAs[Long]("n") == 2 && w0.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming noise pipeline: stream-static join matches the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val grid = noise.Noise.grid(spark, noise.Noise.NantesLat, noise.Noise.NantesLon, 2000.0, 5)
    // event_ids divisible by 97 become sources (97, 194 here)
    val noisy = Seq(
      (97L, ts(0), 1L, "error", 1.0, "{}"),
      (194L, ts(2), 2L, "purchase", 1.0, "{}"),
      (5L, ts(3), 3L, "click", 1.0, "{}")) // not a source
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.streamingNoise(grid,
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("noise_stream")
      .outputMode("update").start()
    try {
      mem.addData(noisy: _*)
      q.processAllAvailable()
      val streamed = spark.table("noise_stream")
        .orderBy("window_start", "g_lat", "g_lon").collect()
      val batch = EventsStreaming.streamingNoise(grid, toDF(noisy))
        .orderBy("window_start", "g_lat", "g_lon").collect()
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed.nonEmpty)
      assert(streamed.forall(_.getDouble(3) > 0.0))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes redelivered events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.dedupedEvents(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      mem.addData(rows.take(2): _*) // redelivery of events 1 and 2
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("foreachBatch writes each micro-batch to its own parquet partition") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("febatch").toString
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.startTumblingForeachBatch(
      mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"), out)
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val written = spark.read.parquet(out)
      assert(written.select("batch_id").distinct().count() >= 2)
      // update-mode: the max count per window/type across batches equals the
      // single batch run over all rows
      val have = written.groupBy("window_start", "event_type")
        .agg(max("n").as("n"))
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      val want = EventsStreaming.tumblingCounts(toDF(rows))
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      assert(have == want)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits a session once the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.sessionizeStream(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        gapMinutes = 30)
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 10L, "click", 1.0, "{}"), (2L, ts(1), 10L, "click", 1.0, "{}"))
      q.processAllAvailable()
      assert(spark.table("session_test").isEmpty) // session still open
      // a much later event advances the watermark far past user 10's gap
      mem.addData((3L, ts(200), 99L, "view", 1.0, "{}"))
      q.processAllAvailable()
      val closed = spark.table("session_test")
        .orderBy("user_id").collect()
      assert(closed.length == 1)
      val r = closed.head
      assert(r.getLong(0) == 10L)
      assert(r.getLong(1) == ts(0).getTime * 1000L) // start
      assert(r.getLong(2) == ts(1).getTime * 1000L) // end
      assert(r.getLong(3) == 2L)
    } finally q.stop()
  }

  test("append mode emits a window only after the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.tumblingCounts(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("append_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 10L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // watermark (max event time - 10 min) has not passed the first
      // window's end yet -> nothing emitted
      assert(spark.table("append_test").count() == 0)
      // an event 30 minutes later pushes the watermark past the first
      // window; the closed window flushes, the open one stays back
      mem.addData((2L, ts(30), 10L, "click", 2.0, "{}"))
      q.processAllAvailable()
      mem.addData((3L, ts(60), 10L, "click", 4.0, "{}"))
      q.processAllAvailable()
      val emitted = spark.table("append_test")
        .select("window_start").collect().map(_.getTimestamp(0)).toSeq
      assert(emitted.nonEmpty && emitted.forall(_.getTime <= ts(30).getTime),
        s"open windows must not be emitted in append mode: $emitted")
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with in-window purchases only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val purchases = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    def df(m: MemoryStream[(Long, Timestamp, Long, String, Double, String)]) =
      m.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventsStreaming.clickPurchaseJoin(df(clicks), df(purchases))
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    try {
      purchases.addData(
        (100L, ts(0), 10L, "purchase", 1.0, "{}"),    // 30 min before click: in window
        (101L, ts(-70), 10L, "purchase", 1.0, "{}"),  // 100 min before: outside 1h
        (102L, ts(40), 10L, "purchase", 1.0, "{}"),   // after the click: excluded
        (103L, ts(0), 99L, "purchase", 1.0, "{}"))    // other user
      clicks.addData((1L, ts(30), 10L, "click", 1.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("ssjoin_test")
        .select("c_event", "p_event").orderBy("p_event").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 100L)), got)
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join: matches emit eagerly, unmatched " +
    "clicks null-pad only after both watermarks pass the interval") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val purchases = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    def df(m: MemoryStream[(Long, Timestamp, Long, String, Double, String)]) =
      m.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventsStreaming.clickPurchaseJoinOuter(df(clicks), df(purchases))
      .writeStream.format("memory").queryName("ssjoin_outer_test")
      .outputMode("append").start()
    try {
      purchases.addData((100L, ts(0), 10L, "purchase", 1.0, "{}"))
      clicks.addData(
        (1L, ts(30), 10L, "click", 1.0, "{}"),  // matched by 100
        (2L, ts(30), 99L, "click", 1.0, "{}"))  // no purchase: outer row
      q.processAllAvailable()
      def got() = spark.table("ssjoin_outer_test")
        .select("c_event", "p_event").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      // before the watermark passes click 2's interval, the unmatched
      // row MUST NOT have emitted (a purchase could still arrive)
      assert(got() == Set((1L, 100L)), s"premature outer row: ${got()}")
      // advance BOTH watermarks far past the interval
      purchases.addData((900L, ts(300), 50L, "purchase", 1.0, "{}"))
      clicks.addData((901L, ts(300), 50L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // one more micro-batch so the state store evicts + emits outers
      purchases.addData((902L, ts(301), 51L, "purchase", 1.0, "{}"))
      clicks.addData((903L, ts(301), 51L, "click", 1.0, "{}"))
      q.processAllAvailable()
      val g = got()
      assert(g.contains((1L, 100L)) && g.contains((2L, -1L)),
        s"outer row missing after watermark: $g")
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.runningUserTotals(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("totals_test")
      .outputMode("update").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val last = spark.table("totals_test")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
        .orderBy("user_id").collect()
      assert(last.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((10L, 3L, 11.0), (11L, 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming quota equals the batch rank across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    // user 10: seven events in window A (quota 5 -> 2 rejected), two in
    // window B; user 11: two in window A. The batch split lands mid-window
    // so quota state must survive the batch boundary.
    val feed = Seq(
      (1L, ts(0), 10L, "c", 1.0, "{}"), (2L, ts(1), 10L, "c", 2.0, "{}"),
      (3L, ts(2), 10L, "c", 3.0, "{}"), (4L, ts(0), 11L, "c", 100.5, "{}"),
      (5L, ts(1), 11L, "c", 0.25, "{}"), (6L, ts(3), 10L, "c", 4.0, "{}"),
      (7L, ts(4), 10L, "c", 5.0, "{}"), (8L, ts(5), 10L, "c", 6.0, "{}"),
      (9L, ts(6), 10L, "c", 7.0, "{}"), (10L, ts(7), 10L, "c", 10.0, "{}"),
      (11L, ts(8), 10L, "c", 11.0, "{}"))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.quotaPerUserWindow(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("quota_test")
      .outputMode("update").start()
    try {
      mem.addData(feed.take(5): _*)
      q.processAllAvailable()
      mem.addData(feed.drop(5): _*)
      q.processAllAvailable()
      // latest state per (user, window) = the row with the highest n_events
      val got = spark.table("quota_test")
        .groupBy("user_id", "win")
        .agg(max(struct(col("n_events"), col("n_admitted"), col("n_rejected"),
          col("admitted_value"))).as("s"))
        .select(col("user_id"), col("win"), col("s.n_events"),
          col("s.n_admitted"), col("s.n_rejected"), col("s.admitted_value"))
        .orderBy("user_id", "win").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toSeq
      assert(got == Seq(
        (10L, 7L, 5L, 2L, 15.0),   // window A: values 1..5 admitted
        (10L, 2L, 2L, 0L, 21.0),   // window B: 10 + 11
        (11L, 2L, 2L, 0L, 100.75)))
      // batch-twin parity: the q338 rank pipeline over the same rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "win").orderBy("us", "event_id")
      val batch = toDF(feed)
        .select(col("user_id"), col("event_id"), col("value"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("win", expr("us DIV 600000000"))
        .withColumn("adm", row_number().over(w) <= 5)
        .groupBy("user_id", "win")
        .agg(count(lit(1)).as("n"),
          sum(when(col("adm"), 1L).otherwise(0L)).as("a"),
          sum(when(col("adm"), 0L).otherwise(1L)).as("j"),
          graft.functions.Det.dsum(
            when(col("adm"), col("value")).otherwise(lit(0.0d))).as("v"))
        .orderBy("user_id", "win").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toSeq
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming EWMA over an in-order feed equals the sequential fold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.ewmaPerUser(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("ewma_test")
      .outputMode("update").start()
    try {
      mem.addData(rows.take(2): _*) // user 10: 1.0 then 2.0 in one batch
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*) // user 11: 4.0; user 10: 8.0
      q.processAllAvailable()
      // latest state per user = the row with the highest n_events
      val last = spark.table("ewma_test")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("ewma"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.ewma"))
        .orderBy("user_id").collect()
      // user 10: seed 1.0 -> 0.25*2 + 0.75*1 = 1.25 -> 0.25*8 + 0.75*1.25
      val e10 = 0.25 * 8.0 + 0.75 * (0.25 * 2.0 + 0.75 * 1.0)
      assert(last.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((10L, 3L, e10), (11L, 1L, 4.0)))
    } finally q.stop()
  }

  test("watermark-ordered EWMA folds out-of-order arrivals in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.ewmaPerUserOrdered(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .toDF("user_id", "n_events", "ewma")
      .writeStream.format("memory").queryName("ewma_ord_test")
      .outputMode("append").start()
    try {
      // user 10's events arrive OUT of event-time order, across batches:
      // ts 7min (v=8) and ts 0min (v=1) first, ts 1min (v=2) later.
      mem.addData((4L, ts(7), 10L, "click", 8.0, "{}"),
        (1L, ts(0), 10L, "click", 1.0, "{}"))
      q.processAllAvailable()
      mem.addData((2L, ts(1), 10L, "click", 2.0, "{}"),
        (90L, ts(40), 99L, "view", 5.0, "{}")) // advances the watermark
      q.processAllAvailable()
      mem.addData((91L, ts(41), 99L, "view", 6.0, "{}")) // watermark now 30min
      q.processAllAvailable()
      val last = spark.table("ewma_ord_test")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("ewma"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.ewma"))
        .orderBy("user_id").collect()
      // the fold must apply 1.0, 2.0, 8.0 in EVENT-TIME order despite arrival
      val e10 = 0.25 * 8.0 + 0.75 * (0.25 * 2.0 + 0.75 * 1.0)
      val u10 = last.find(_.getLong(0) == 10L).get
      assert((u10.getLong(1), u10.getDouble(2)) == ((3L, e10)))
    } finally q.stop()
  }

  test("watermark-ordered EWMA keeps MICROSECOND event-time order inside one millisecond") {
    // Two events land in the SAME millisecond, 100us and 900us in, with
    // event_ids INVERTED relative to event time. A fold keying on
    // Timestamp.getTime*1000 truncates both to the same microsecond value,
    // falls through to the event_id tiebreak, and folds them backwards
    // (6.25 instead of 2.75) — this pins the full-precision getNanos path
    // that matches the batch fold's Catalyst microsecond ordering.
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def tsUs(us: Int): Timestamp = {
      val t = new Timestamp(base)
      t.setNanos(us * 1000)
      t
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.ewmaPerUserOrdered(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .toDF("user_id", "n_events", "ewma")
      .writeStream.format("memory").queryName("ewma_us_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, tsUs(900), 10L, "click", 8.0, "{}"), // later event time, lower id
        (2L, tsUs(100), 10L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // far-future row advances the watermark past both buffered events
      mem.addData((90L, new Timestamp(base + 40 * 60000L), 99L, "view", 5.0, "{}"))
      q.processAllAvailable()
      mem.addData((91L, new Timestamp(base + 41 * 60000L), 99L, "view", 6.0, "{}"))
      q.processAllAvailable()
      val last = spark.table("ewma_us_test")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("ewma"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.ewma"))
        .collect()
      val u10 = last.find(_.getLong(0) == 10L).get
      // event-time order is 1.0 (at +100us) then 8.0 (at +900us)
      assert((u10.getLong(1), u10.getDouble(2)) == ((2L, 0.25 * 8.0 + 0.75 * 1.0)))
    } finally q.stop()
  }

  test("streaming near-dup arrivals equal the batch delta dedup on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val baseText = "the quick brown fox jumps over the lazy dog again and again today"
    val otherText = "completely different words about spark query engines and big data systems"
    val history = Seq((1L, baseText + " dup"), (2L, otherText))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDS().toDF("doc_id", "arrival_ts", "text")
    val q = EventsStreaming.nearDupArrivals(stream, history)
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      mem.addData((10L, ts(0), baseText)) // near-dup of history doc 1
      q.processAllAvailable()
      mem.addData((11L, ts(1), "nothing in common with anything at all here truly"))
      q.processAllAvailable()
      val streamed = spark.table("neardup_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.operators.Dedup.deltaDedupPairs(
          Seq((10L, baseText), (11L, "nothing in common with anything at all here truly"))
            .toDF("doc_id", "text"),
          history, shingleK = 3, rowsPerBand = 2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == Set((10L, 1L)), s"batch reference unexpected: $batch")
      assert(streamed == batch, s"streamed $streamed != batch $batch")
    } finally q.stop()
  }

  test("streaming sim64 arrivals probe the persisted index like the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Dedup
    val baseText = "the quick brown fox jumps over the lazy dog again and again today"
    val otherText = "completely different words about spark query engines and big data systems"
    // sim64's banded probe guarantees recall only to Hamming radius 3 —
    // the planted match is the IDENTICAL text (radius 0); the word-level
    // near-dup ("+ dup") that LSH-Jaccard catches lands outside radius 3
    // and must NOT appear (that's the fingerprint-vs-shingle trade)
    val history = Seq((1L, baseText), (2L, otherText))
      .toDF("doc_id", "text")
    Dedup.writeSim64Index(Dedup.simhash64Table(history, shingleK = 3),
      indexTable = "sim64_arrivals_idx")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDS().toDF("doc_id", "arrival_ts", "text")
    val q = EventsStreaming.sim64Arrivals(stream,
        indexTable = "sim64_arrivals_idx")
      .writeStream.format("memory").queryName("sim64_arrivals_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (10L, ts(0), baseText), // near-dup of history doc 1
        (11L, ts(1), "nothing in common with anything at all here truly"),
        (10L, ts(2), baseText)) // redelivery: pair dedup must absorb it
      q.processAllAvailable()
      val streamed = spark.table("sim64_arrivals_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val batch = Dedup.probeSim64Index(
          Dedup.simhash64Table(
            Seq((10L, baseText),
              (11L, "nothing in common with anything at all here truly"))
              .toDF("doc_id", "text"), shingleK = 3),
          maxHamming = 3, indexTable = "sim64_arrivals_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(batch == Seq((10L, 1L)), s"batch reference unexpected: $batch")
      // seq (not set) compare: the redelivered doc must yield ONE pair
      assert(streamed.sorted == batch.sorted,
        s"streamed $streamed != batch $batch")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sim64_arrivals_idx")
    }
  }

  test("near-dup arrivals survive a kill-and-restart from checkpoint: " +
    "no duplicate pair, no lost pair vs the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val baseText = "the quick brown fox jumps over the lazy dog again and again today"
    val otherText = "completely different words about spark query engines and big data systems"
    val history = Seq((1L, baseText + " dup"), (2L, otherText))
      .toDF("doc_id", "text")
    val ckpt = java.nio.file.Files.createTempDirectory("neardup-ckpt").toString
    // the memory sink refuses checkpoint recovery, so the sink is the
    // idempotent foreachBatch pattern (each micro-batch overwrites its own
    // batch_id=N directory — a replayed batch lands exactly once)
    val outDir = java.nio.file.Files.createTempDirectory("neardup-out").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDS().toDF("doc_id", "arrival_ts", "text")
    def start() =
      EventsStreaming.nearDupArrivals(stream, history)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        .start()
    def emitted(): Seq[(Long, Long)] =
      spark.read.option("basePath", outDir).parquet(outDir)
        .select("new_doc", "old_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // Phase 1: one near-dup (10~1) and one unrelated doc, fully committed.
    val q1 = start()
    val phase1 =
      try {
        mem.addData(
          (10L, ts(0), baseText),
          (11L, ts(1), "nothing in common with anything at all here truly"))
        q1.processAllAvailable()
        emitted()
      } finally q1.stop() // the kill: query gone, checkpoint + state remain
    assert(phase1 == Seq((10L, 1L)), s"phase 1 unexpected: $phase1")
    // Phase 2 data lands WHILE the query is down: doc 10 is RE-SENT (its
    // pair must NOT re-emit — only the checkpointed dropDuplicates state
    // can know that) and doc 12 is a fresh near-dup (must emit — a restart
    // that lost source offsets or skipped the batch would drop it).
    mem.addData(
      (10L, ts(2), baseText),
      (12L, ts(3), baseText + " extra"))
    val q2 = start()
    val all =
      try { q2.processAllAvailable(); emitted() } finally q2.stop()
    // exactly-once across the restart: no pair ever emitted twice
    assert(all.distinct == all, s"duplicate emission across restart: $all")
    val phase2 = all.diff(phase1)
    assert(phase2 == Seq((12L, 1L)),
      s"phase 2 must emit exactly the fresh pair (12,1): $phase2")
    // Union across the restart equals the batch twin over ALL distinct docs
    val batch = graft.operators.Dedup.deltaDedupPairs(
        Seq((10L, baseText), (11L, "nothing in common with anything at all here truly"),
          (12L, baseText + " extra")).toDF("doc_id", "text"),
        history, shingleK = 3, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.toSet == batch,
      s"restart union ${all.toSet} != batch twin $batch")
  }

  test("streaming count-min state equals the batch sketch counter-for-counter") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.streamingCountMin(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("cm_test")
      .outputMode("update").start()
    try {
      val evs = (0 until 300).map { i =>
        (i.toLong, ts(i % 20), (i * 6947L) % 97, "click", 1.0, "{}")
      }
      // AT EACH MICRO-BATCH: the streamed state must equal the q129 batch
      // sketch of the SAME PREFIX, counter for counter — the mergeable-
      // state property, checked at every prefix rather than just the end
      var seen = Vector.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      Seq(evs.take(150), evs.drop(150)).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen ++= b
        // latest streamed state per row: counters only grow, so the
        // emission with the largest total IS this prefix's
        val byRow = spark.table("cm_test").collect()
          .map(r => (r.getInt(0), r.getSeq[Long](1)))
          .groupBy(_._1).map { case (row, emits) => row -> emits.map(_._2).maxBy(_.sum) }
        val batch = EventsStreaming.countMinRows(toDF(seen))
          .groupBy("row", "bucket").count().collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
        (0 until 4).foreach { row =>
          val counters = byRow(row)
          assert(counters.size == 512)
          counters.zipWithIndex.foreach { case (c, bucket) =>
            assert(c == batch.getOrElse((row, bucket), 0L),
              s"prefix ${seen.size} cell ($row, $bucket): streamed $c vs " +
                s"batch ${batch.getOrElse((row, bucket), 0L)}")
          }
        }
      }
    } finally q.stop()
  }

  test("streaming HLL registers converge to the batch registers' estimate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.hllDistinctUsers(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("hll_test")
      .outputMode("update").start()
    try {
      // 400 events over 180 distinct users across 2 types, split in 2 batches
      val evs = (0 until 400).map { i =>
        (i.toLong, ts(i % 30), (i * 7919L) % 180,
          if (i % 3 == 0) "click" else "view", 1.0, "{}")
      }
      // AT EACH MICRO-BATCH: the streamed estimate must equal the q132
      // register derivation over the SAME PREFIX (register max is the HLL
      // merge, so streaming state after any prefix IS the batch sketch of
      // that prefix)
      var seen = Vector.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      Seq(evs.take(200), evs.drop(200)).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen ++= b
        // latest streamed estimate per type (update mode appends per batch)
        val streamed = spark.table("hll_test")
          .groupBy("event_type")
          .agg(org.apache.spark.sql.functions.collect_list("est_distinct").as("es"))
          .collect().map(r => r.getString(0) -> r.getSeq[Double](1).last).toMap
        val batchDf = seen.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        val regRows = EventsStreaming.hllRegisterRows(batchDf)
          .groupBy("event_type", "idx")
          .agg(max("rho").as("m")).collect()
        val want = regRows.groupBy(_.getString(0)).map { case (t, rows) =>
          val regs = new Array[Int](256)
          rows.foreach(r => regs(r.getInt(1)) = r.getInt(2))
          t -> EventsStreaming.hllEstimate(regs)
        }
        assert(streamed == want, s"prefix ${seen.size}: streamed=$streamed want=$want")
      }
      // sanity: the final estimate is within HLL's expected error of truth
      val batchDf = evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val streamed = spark.table("hll_test")
        .groupBy("event_type")
        .agg(org.apache.spark.sql.functions.collect_list("est_distinct").as("es"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1).last).toMap
      val exact = batchDf.groupBy("event_type")
        .agg(countDistinct("user_id").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (t, n) =>
        assert(math.abs(streamed(t) - n) / n < 0.2, s"$t: est=${streamed(t)} exact=$n")
      }
    } finally q.stop()
  }

  test("streaming sliding windows equal the batch run; events land in two windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.slidingCounts(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sliding_test")
        .orderBy("window_start", "event_type").collect()
      val batch = EventsStreaming.slidingCounts(toDF(rows))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.toSeq == batch.toSeq)
      // every event is counted exactly twice across overlapping windows
      assert(batch.map(_.getAs[Long]("n")).sum == 2L * rows.size)
    } finally q.stop()
  }

  test("lake ingest: file stream over events parquet, one file per trigger") {
    // the standard lake pattern: a directory of parquet files consumed as a
    // stream (maxFilesPerTrigger = admission control), aggregated with the
    // SAME transform as batch. The lake files are written through
    // Tables.load, which already normalizes the fixture's TIMESTAMP(NANOS)
    // to micros — so the stream reads plain timestamps.
    val dir = java.nio.file.Files.createTempDirectory("events_lake").toString
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // two files -> two micro-batches
    batch.repartition(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventsStreaming.tumblingCounts(stream)
      .writeStream.format("memory").queryName("lake_ingest_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("lake_ingest_test")
        .orderBy("window_start", "event_type").collect()
      val expected = EventsStreaming.tumblingCounts(batch)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.toSeq == expected.toSeq)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        q.recentProgress.toSeq.map(_.numInputRows))
    } finally q.stop()
  }

  test("streaming PII redaction: file stream over documents equals the batch transform") {
    // stateless transforms run unchanged on a stream — the same redactPii
    // the batch query surface uses (q113), fed by the lake file pattern
    val dir = java.nio.file.Files.createTempDirectory("docs_lake").toString
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    batch.repartition(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    def out(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.redactPii(df, "text")
        .select($"doc_id", $"n_emails", $"n_phones", $"redacted")
    val q = out(stream)
      .writeStream.format("memory").queryName("pii_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pii_stream_test").orderBy("doc_id").collect()
      val expected = out(batch).orderBy("doc_id").collect()
      assert(streamed.toSeq == expected.toSeq)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        q.recentProgress.toSeq.map(_.numInputRows))
    } finally q.stop()
  }

  test("streaming container probe: file stream of mixed payloads equals " +
    "the batch probe") {
    // probeContainers is a stateless mapPartitions transform, so it runs
    // unchanged on a stream — the ingest-time probe a media lake applies
    // as payloads ARRIVE, reject rows included
    import graft.operators.{MediaCodecs, Mp4Boxes, MpegFrames, Multimodal}
    val dir = java.nio.file.Files.createTempDirectory("media_lake").toString
    val payloads = Seq(
      1L -> Mp4Boxes.synthMp4("isom", 1, Seq("mp41"), 600, 1200,
        Seq(Mp4Boxes.SynthTrack(1, "soun", "mp4a", 0, 0, 48000, 96000, "eng")),
        4, _ => 2),
      2L -> MpegFrames.synthStream(2, 1, Seq((3, false), (4, true)), (_, j) => j),
      3L -> MediaCodecs.encodeWavPcm16(8000, Array.tabulate(24)(_.toShort)),
      4L -> graft.operators.TiffProbe.synthTiff(littleEndian = true,
        Seq(graft.operators.TiffProbe.SynthPage(12, 8, 8, 1, 1, 3))),
      5L -> "no container at all".getBytes("UTF-8"))
    val batch = payloads.map { case (id, p) =>
      Multimodal.MediaRow(id, p, Multimodal.MediaMeta("x", p.length, 0L))
    }.toDS()
    batch.toDF().repartition(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(batch.toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[Multimodal.MediaRow]
    val q = Multimodal.probeContainers(stream).toDF()
      .writeStream.format("memory").queryName("probe_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("probe_stream_test").orderBy("doc_id").collect()
      val expected = Multimodal.probeContainers(batch).toDF()
        .orderBy("doc_id").collect()
      assert(streamed.toSeq == expected.toSeq)
      // the content is the full dispatch surface: 4 families + 1 reject
      val kinds = streamed.map(_.getAs[String]("container")).toSeq
      assert(kinds == Seq("mp4", "mpeg", "wav", "tiff", null))
    } finally q.stop()
  }

  test("streaming decontamination flags arriving docs against the static eval set") {
    implicit val sqlCtx = spark.sqlContext
    // static eval set: one doc whose 4-grams are known
    val evalSet = Seq((100L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDS().toDF("doc_id", "arrival_ts", "text")
    val q = EventsStreaming.contaminatedDocs(stream, evalSet, 4)
      .writeStream.format("memory").queryName("contam_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts(0), "contains the quick brown fox here"), // shares a 4-gram
        (2L, ts(1), "totally unrelated words only here"),
        (1L, ts(2), "contains the quick brown fox here"), // redelivery
        (3L, ts(3), "quick brown fox jumps high"))        // shares a 4-gram
      q.processAllAvailable()
      val got = spark.table("contam_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 3L), s"got $got")
    } finally q.stop()
  }

  test("stream-static bloom prune keeps exactly the hot-user events") {
    implicit val sqlCtx = spark.sqlContext
    val hot = Seq(10L, 12L).toDF("hot_id")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val stream = mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventsStreaming.bloomPrunedEvents(stream, hot, expectedItems = 100L)
      .select("event_id", "user_id")
      .writeStream.format("memory").queryName("bloom_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts(0), 10L, "click", 1.0, "{}"),
        (2L, ts(1), 11L, "click", 2.0, "{}"), // cold user: pruned
        (3L, ts(2), 12L, "view", 3.0, "{}"))
      q.processAllAvailable()
      mem.addData(
        (4L, ts(3), 13L, "view", 4.0, "{}"), // cold user: pruned
        (5L, ts(4), 10L, "purchase", 5.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("bloom_test").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 3L, 5L), s"got $got")
    } finally q.stop()
  }

  test("streaming Misra-Gries candidates keep the superset guarantee across batches") {
    implicit val sqlCtx = spark.sqlContext
    val k = 5
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStreaming.streamingHeavyHitters(
        mem.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"), k)
      .writeStream.format("memory").queryName("mg_test")
      .outputMode("update").start()
    try {
      // 200 events: user 7 gets ~40% of clicks, user 9 ~30%; the long tail
      // cycles through 17 cold users. Split across two batches so state
      // genuinely carries over.
      val evs = (0 until 200).map { i =>
        val u = if (i % 5 < 2) 7L else if (i % 10 < 5) 9L else 100L + (i % 17)
        (i.toLong, ts(i % 30), u, "click", 1.0, "{}")
      }
      mem.addData(evs.take(90): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(90): _*)
      q.processAllAvailable()
      // final emission per item = the one with the largest n_seen
      val emits = spark.table("mg_test").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val lastN = emits.map(_._3).max
      val candidates = emits.filter(_._3 == lastN).map(_._1).toSet
      assert(lastN == 200L, s"state did not see all events: $lastN")
      assert(candidates.size <= k - 1, s"state exceeded k-1 counters: $candidates")
      // superset guarantee: every item with true count > n/k is a candidate
      val trueCounts = evs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val trueHeavy = trueCounts.filter(_._2 * k > 200L).keySet.map(_.toString)
      assert(trueHeavy.nonEmpty && trueHeavy.subsetOf(candidates),
        s"heavy $trueHeavy not all in candidates $candidates")
      // exact verify phase (the Sketches.heavyHitters second pass) over the
      // streamed candidate set recovers exactly the true heavy hitters
      val verified = toDF(evs)
        .filter(col("user_id").cast("string").isin(candidates.toSeq: _*))
        .groupBy(col("user_id").cast("string").as("item"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > 200L)
        .collect().map(_.getString(0)).toSet
      assert(verified == trueHeavy, s"verified $verified != true $trueHeavy")
    } finally q.stop()
  }

  test("streaming index maintenance: probe-then-commit per micro-batch sees prior batches") {
    // the CONTINUOUS version of the persisted-LSH-index nightly loop: each
    // micro-batch probes the STORED index for near-dups, then commits
    // itself via appendLshIndex — so batch 2's matches include batch 1's
    // docs without any history re-hash. foreachBatch is the composition
    // point (the probe/append operators are plain batch functions).
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely different words about spark query engines and big data systems"
    Dedup.writeLshIndex(
      Seq((1L, base), (3L, other)).toDF("doc_id", "text"),
      shingleK = 3, rowsPerBand = 2,
      indexTable = "stream_idx", shingleTable = "stream_sh")
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val pairs = Dedup.probeLshIndex(batch, shingleK = 3, rowsPerBand = 2,
            threshold = 0.5, indexTable = "stream_idx", shingleTable = "stream_sh")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        perBatch.synchronized { perBatch(id) = pairs }
        Dedup.appendLshIndex(batch, shingleK = 3, rowsPerBand = 2,
          indexTable = "stream_idx", shingleTable = "stream_sh")
      }
      .start()
    try {
      mem.addData((10L, base + " dup"))
      q.processAllAvailable()
      mem.addData((20L, base + " dup extra"))
      q.processAllAvailable()
      assert(perBatch(0L) == Set((10L, 1L)), perBatch.toString)
      // batch 2 matches BOTH the original history and batch 1's committed doc
      assert(perBatch(1L) == Set((20L, 1L), (20L, 10L)), perBatch.toString)
      // the stored shingle table now carries history + both batches. The
      // appends ran in foreachBatch's per-batch session clones, which
      // refresh THEIR relation caches — this session's cached file
      // listing is stale until refreshed (standard cross-session Spark
      // semantics; the in-loop probes resolved fresh, as the (20,10)
      // match proves)
      spark.catalog.refreshTable("stream_sh")
      assert(spark.table("stream_sh").select("doc_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L, 10L, 20L))
    } finally q.stop()
  }
  test("streaming delta replay equals batch replay at every log prefix") {
    import graft.operators.DeltaReplay
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = DeltaReplay.replayStream(mem.toDS().toDF("version", "line"))
      .writeStream.format("memory").queryName("delta_replay_test")
      .outputMode("update").start()
    try {
      def add(p: String, size: Long, v: Long) =
        (v, s"""{"add":{"path":"$p","size":$size,"dataChange":true}}""")
      def remove(p: String, v: Long) =
        (v, s"""{"remove":{"path":"$p","deletionTimestamp":1}}""")
      val noise = (0L, """{"commitInfo":{"operation":"WRITE"}}""")
      val batch1 = Seq(add("a", 10, 0), add("b", 20, 0), noise,
        remove("a", 1))
      val batch2 = Seq(add("a", 30, 2), remove("b", 3), add("c", 5, 3),
        // a LATE, stale action: must not regress c's state
        add("c", 999, 1))
      var seen = Vector.empty[(Long, String)]
      Seq(batch1, batch2).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen ++= b
        // latest streamed state per path: (last_version, is_live) only
        // grows, so the max emission IS this prefix's state
        val streamed = spark.table("delta_replay_test").collect()
          .map(r => (r.getString(0),
            (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2),
              r.getLong(3))))
          .groupBy(_._1)
          .map { case (p, es) =>
            p -> es.map(_._2).maxBy(e => (e._3, e._1)) }
        val batchState = DeltaReplay.replay(
          seen.toDF("version", "line")).collect()
          .map(r => r.getString(0) ->
            ((r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2),
              r.getLong(3)))).toMap
        assert(streamed == batchState, s"prefix ${seen.size}")
      }
      // final semantic check: a resurrected, b tombstoned, c live with
      // the NEWER version's size despite the stale late add
      val fin = DeltaReplay.replay(seen.toDF("version", "line")).collect()
        .map(r => r.getString(0) -> (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
      assert(fin("a") == ((true, 30L)))
      assert(fin("b") == ((false, -1L)))
      assert(fin("c") == ((true, 5L)))
    } finally q.stop()
  }

  test("checkpoint-seeded streaming replay equals the batch checkpoint " +
    "overlay at every tail prefix") {
    import graft.operators.DeltaReplay
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // checkpoint at V=4: one live add, one tombstone, one live the tail
    // never touches (must still surface), one live a STALE tail action
    // attacks (must not regress)
    val ckpt = Seq(
      ("a", true, Some(10L), 3L),
      ("gone", false, None: Option[Long], 4L),
      ("untouched", true, Some(7L), 2L),
      ("stale-target", true, Some(50L), 4L)).toDF(
      "path", "is_add", "size", "version")
    val mem = MemoryStream[(Long, String)]
    val q = DeltaReplay.replayStreamFromCheckpoint(
      ckpt, mem.toDS().toDF("version", "line"))
      .writeStream.format("memory").queryName("ckpt_replay_test")
      .outputMode("update").start()
    try {
      def add(p: String, size: Long, v: Long) =
        (v, s"""{"add":{"path":"$p","size":$size,"dataChange":true}}""")
      def remove(p: String, v: Long) =
        (v, s"""{"remove":{"path":"$p","deletionTimestamp":1}}""")
      val batch1 = Seq(remove("a", 5), add("gone", 9, 6),
        remove("stale-target", 1)) // stale: version 1 < seeded 4
      val batch2 = Seq(add("a", 11, 7), add("fresh", 3, 8))
      var seen = Vector.empty[(Long, String)]
      Seq(batch1, batch2).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen ++= b
        val streamed = spark.table("ckpt_replay_test").collect()
          .map(r => (r.getString(0),
            (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2),
              r.getLong(3))))
          .groupBy(_._1)
          .map { case (p, es) =>
            p -> es.map(_._2).maxBy(e => (e._3, e._1)) }
        val batchState = DeltaReplay.replayFromCheckpoint(
          ckpt, seen.toDF("version", "line")).collect()
          .map(r => r.getString(0) ->
            ((r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2),
              r.getLong(3)))).toMap
        // untouched seeds surface in the BATCH overlay always; in the
        // stream they surface once any batch ran (initial state is
        // emitted by the batch-mode run; the streaming query emits a
        // path when first touched) — compare on the streamed key set
        // for prefix parity, then check the full set in batch
        streamed.foreach { case (p, st) =>
          assert(batchState(p) == st, s"path $p at prefix ${seen.size}")
        }
      }
      val fin = DeltaReplay.replayFromCheckpoint(
        ckpt, seen.toDF("version", "line")).collect()
        .map(r => r.getString(0) ->
          ((r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
      assert(fin("a") == ((true, 11L)))
      assert(fin("gone") == ((true, 9L)))
      assert(fin("untouched") == ((true, 7L)))
      assert(fin("stale-target") == ((true, 50L))) // stale remove lost
      assert(fin("fresh") == ((true, 3L)))
      // the batch-mode run of the SAME function surfaces untouched seeds
      val batchMode = DeltaReplay.replayStreamFromCheckpoint(
        ckpt, seen.toDF("version", "line")).collect()
        .map(r => r.getString(0) ->
          ((r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
      assert(batchMode == fin)
    } finally q.stop()
  }
}
