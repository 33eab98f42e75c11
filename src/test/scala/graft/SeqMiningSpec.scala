package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.StreamingQueries

/** q140 sequential pattern mining: crafted event log with known
  * sessions, checked against hand-computed trigram counts. */
class SeqMiningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  test("trigrams never cross session boundaries; support counts sessions, not occurrences") {
    // user 1, session A: view>click>view>click>view  (trigrams:
    //   v>c>v x2, c>v>c x1)
    // user 1, session B (31-min gap): view>click>view (v>c>v x1)
    // user 2, one session: purchase>view (too short: no trigram)
    val rows = Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"),
      (3L, ts(2), 1L, "view"), (4L, ts(3), 1L, "click"),
      (5L, ts(4), 1L, "view"),
      (6L, ts(40), 1L, "view"), (7L, ts(41), 1L, "click"),
      (8L, ts(42), 1L, "view"),
      (9L, ts(0), 2L, "purchase"), (10L, ts(1), 2L, "view"))
      .map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = java.nio.file.Files.createTempDirectory("graft_seq_spec_")
    try {
      rows.write.parquet(s"$base/events.parquet")
      val out = StreamingQueries.q140SeqMining(spark, base.toString)
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(out == Seq(
        (1L, "view>click>view", 3L, 2L),   // 2 in session A + 1 in B; 2 sessions
        (2L, "click>view>click", 1L, 1L)))
      // had the 31-minute gap not split the sessions, click>view>view
      // and view>view>click trigrams would exist — their absence IS the
      // boundary test
      assert(!out.exists(_._2.contains("view>view")))
    } finally {
      val p = new org.apache.hadoop.fs.Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
