package graft

import graft.operators.Skew
import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Skew-salting equivalence + custom stateful sessionization. */
class SkewSessionSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation ≡ unsalted aggregation (any salt width)") {
    val words = Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
    val plain = words.groupBy($"word".as("key")).agg(count("*").as("n"))
    for (salts <- Seq(1, 8, 32)) {
      val salted = Skew.saltedCount(words, $"word", $"doc_id", salts)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salts=$salts")
    }
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(input.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()

    def ts(x: String) = Timestamp.valueOf(x)
    // user 7: two events 10 min apart (one session), then a 2 h gap
    input.addData(
      Sessionize.Event(7L, ts("2024-01-01 10:00:00")),
      Sessionize.Event(7L, ts("2024-01-01 10:10:00")),
      Sessionize.Event(7L, ts("2024-01-01 12:30:00")))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[Sessionize.Session].collect()
    assert(closed.length == 1)
    assert(closed.head.user_id == 7L)
    assert(closed.head.n_events == 2L)

    // a later event within the gap extends the open session (no new close)
    input.addData(Sessionize.Event(7L, ts("2024-01-01 12:40:00")))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 1)

    // an event past the gap closes the extended session (2 events)
    input.addData(Sessionize.Event(7L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sessions").as[Sessionize.Session].collect()
    assert(all.length == 2)
    assert(all.map(_.n_events).sorted.toSeq == Seq(2L, 2L))
  }
}
