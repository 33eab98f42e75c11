package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventStreams

/** Batch entries for the time-windowed transformations in
  * [[graft.streaming.EventStreams]]: the SAME plan code runs here over
  * the parquet `events` fixture (giving an exact DuckDB-oracle gate) and
  * under `readStream` in the streaming suite — `withWatermark` is
  * eliminated by Catalyst in batch mode, so the shared functions need no
  * mode switch. */
object StreamingQueries {

  /** Tumbling 1-hour windows per event type. */
  def q24WindowTime(spark: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingCounts(Tables.events(spark, dir), width = "1 hour")
      .orderBy(col("window_start"), col("event_type"))

  val q24WindowTimeSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
      |  event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin

  /** Per-user session windows (30-minute inactivity gap). The DuckDB
    * mirror is the classic gaps-and-islands form; session_window.end is
    * last-event-ts + gap in both. */
  def q25Sessionize(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessionize(Tables.events(spark, dir), gap = "30 minutes")
      .orderBy(col("user_id"), col("session_start"))

  /** Sliding windows (1-hour width, 30-minute slide): each event lands in
    * width/slide = 2 overlapping windows. The same `slidingAvg` code runs
    * under `readStream` in EventStreamsSpec; this batch entry gives it an
    * exact oracle (each event replicated into its 2 enclosing windows —
    * window starts are slide-aligned to the epoch in both engines). The
    * gate compares sum_value, not avg_value: see the slidingAvg doc. */
  def q35Sliding(spark: SparkSession, dir: String): DataFrame =
    EventStreams.slidingAvg(Tables.events(spark, dir),
        width = "1 hour", slide = "30 minutes")
      .select(col("window_start"), col("window_end"), col("event_type"),
        col("sum_value"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))

  val q35SlidingSql: String =
    """SELECT time_bucket(INTERVAL '30 minutes', ts) - o.o * INTERVAL 30 MINUTE
      |    AS window_start,
      |  time_bucket(INTERVAL '30 minutes', ts) - o.o * INTERVAL 30 MINUTE
      |    + INTERVAL 1 HOUR AS window_end,
      |  event_type, round(sum(value), 4) AS sum_value, count(*) AS n_events
      |FROM events, range(2) o(o)
      |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin

  /** Batch counterpart of the stateful `runningUserTotals`
    * (flatMapGroupsWithState): in batch mode the state starts empty and
    * each user's group is processed once, so the emitted totals ARE the
    * final state — which a plain GROUP BY reproduces, giving the custom
    * state logic an exact oracle (the streaming-incremental behavior is
    * covered by EventStreamsSpec's MemoryStream cases). */
  def q36UserTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir).as[EventStreams.Event]
    EventStreams.runningUserTotals(events).toDF()
      .select(col("user_id"), col("n_events"),
        round(col("total_value"), 4).as("total_value"))
      .orderBy(col("user_id"))
  }

  val q36UserTotalsSql: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val q25SessionizeSql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |    -- >= not >: Spark sessions are half-open [start, last+gap), so an
      |    -- event at EXACTLY last+gap starts a new session
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin
}
