package graft

import graft.operators.GraphMerge
import graft.streaming.StreamPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Structured-Streaming path tests (SURVEY §5.5): MemoryStream micro-
  * batches replaying the graph-mutation message shape, asserting
  * exactly-once-effective MERGE results and windowed metrics. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ST1/ST2: stream → element extraction → foreachBatch merge is " +
    "exactly-once-effective across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    var store = Seq.empty[(String, String, String, Long, String)]
      .toDF("uid", "text", "lang", "version", "status")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def runOnce(): Unit = {
      // Trigger.AvailableNow consumes what exists and terminates, so each
      // delivery wave is its own run resuming from the same checkpoint —
      // the poll-loop shape of the reference (main.py:96-105).
      val q = StreamPipeline.run(events, ckpt) { (batch, _) =>
        val incoming = batch.select(
          $"event_id".cast("string").as("uid"),
          concat(lit("payload "), $"event_type").as("text"),
          lit("en").as("lang"), lit(0.5).as("sim"))
        // localCheckpoint truncates lineage: the merged store must not
        // keep a reference to the micro-batch frame after the batch ends.
        store = GraphMerge.merge(store, incoming, Seq("text", "lang"))
          .localCheckpoint(true)
        ()
      }
      q.awaitTermination()
    }
    input.addData((1L, ts("2024-01-01 00:00:00"), 7L, "signup", 1.0))
    input.addData((2L, ts("2024-01-01 00:30:00"), 7L, "purchase", 2.0))
    runOnce()

    // Re-deliver event 1 (at-least-once source): merge must not create a
    // duplicate live row — a redelivery with changed sim forks a version,
    // identical-content handling is the dedup gate's job upstream; here
    // we assert single live row per uid.
    input.addData((1L, ts("2024-01-01 00:00:00"), 7L, "signup", 1.0))
    runOnce()

    val live = store.filter($"status" =!= "archive")
    assert(live.filter($"uid" === "1").count() == 1)
    assert(live.filter($"uid" === "2").count() == 1)
    assert(store.filter($"uid" === "1").count() == 2) // v1 archived + v2
  }

  test("windowed throughput with watermark emits per-window counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = StreamPipeline.throughput(events, "1 hour", "2 hours")

    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("tp").start()
    input.addData(
      (1L, ts("2024-01-01 10:05:00"), 1L, "signup", 1.0),
      (2L, ts("2024-01-01 10:55:00"), 2L, "signup", 3.0),
      (3L, ts("2024-01-01 11:05:00"), 3L, "error", 5.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tp")
      .select($"ws".cast("string"), $"event_type", $"n", $"total_value")
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows.contains(("2024-01-01 10:00:00", "signup", 2L, 4.0)))
    assert(rows.contains(("2024-01-01 11:00:00", "error", 1L, 5.0)))
  }
}
