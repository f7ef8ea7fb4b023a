package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming exact-dedup via the `transformWithState` arbitrary-state
  * operator (the modern replacement for `flatMapGroupsWithState`,
  * RocksDB-backed): one `ValueState[Boolean]` per content fingerprint;
  * the first arrival of a fingerprint is `new`, every later arrival —
  * in the same micro-batch or any following one — is `duplicate`.
  *
  * This is the streaming-native form of the dedup gate's exact tier
  * (ST7, `check_duplicate.py:183-289` first check): at 100 TB the state
  * is partitioned by fingerprint across executors and stored in
  * RocksDB, so membership is a local point lookup, with TTL available
  * to bound state for time-windowed dedup policies.
  */
class FingerprintDedup
    extends StatefulProcessor[String, (String, Long), (Long, String)] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(Long, String)] = {
    // rows of one fingerprint arrive together; state makes the FIRST-ever
    // arrival new and everything after duplicate. Materialized eagerly:
    // if the returned iterator were lazy and a downstream operator
    // stopped consuming early, seen.update would never run for the
    // unconsumed rows and the fingerprint could re-classify as new later.
    val out = rows.map { case (_, uid) =>
      if (seen.exists()) (uid, "duplicate")
      else {
        seen.update(true)
        (uid, "new")
      }
    }.toVector
    out.iterator
  }
}

object StreamDedup {
  /** (fingerprint, uid) stream → (uid, outcome) stream. */
  def dedupByFingerprint(
      in: Dataset[(String, Long)]): Dataset[(Long, String)] = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    in.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new FingerprintDedup, TimeMode.None(),
        OutputMode.Update(), enc)
  }
}
