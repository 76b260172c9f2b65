package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det.{dsum, dsumSql}

/** Event-stream analytics in batch form: tumbling-window aggregation (the
  * batch-equivalent of graft.streaming.EventsStreaming — same bucketing
  * logic, oracle-checkable) and gap-based sessionization. Time buckets are
  * pure integer microsecond arithmetic so both engines agree exactly.
  */
object EventQueries {

  /** 5-minute tumbling buckets: (bucket_us, event_type) → count, sum. */
  val q37TumblingWindow: QueryDef = QueryDef(
    "q37_tumbling_window",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(expr("(unix_micros(ts) DIV 300000000) * 300000000").as("bucket_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket_us", "event_type"),
    Some(s"""
      SELECT (epoch_us(ts) // 300000000) * 300000000 AS bucket_us,
             event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Gap sessionization: a >30-minute silence starts a new session.
    * lag + flag + per-user aggregation — the classic streaming-state shape
    * expressed as windows.
    */
  val q38Sessionize: QueryDef = QueryDef(
    "q38_sessionize",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
        .withColumn("brk",
          when(col("us") - lag("us", 1).over(w) > 1800000000L, 1).otherwise(0))
        .groupBy("user_id")
        .agg((sum(col("brk")) + 1L).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      m AS (SELECT user_id,
              CASE WHEN us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
                        > 1800000000 THEN 1 ELSE 0 END AS brk
            FROM e)
      SELECT user_id, CAST(sum(brk) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
      FROM m GROUP BY user_id ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(q37TumblingWindow, q38Sessionize)
}
