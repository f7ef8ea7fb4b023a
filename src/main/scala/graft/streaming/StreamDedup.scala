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
    // Sorted by uid first (r20 review): two uids sharing a fingerprint
    // in ONE micro-batch arrive in shuffle order, so an arrival-order
    // claim would make which row is "new" nondeterministic across runs
    // and replays — the min-uid claim is the batch gate's
    // "earlier id wins" rule, the same fix BandDedup below documents.
    val out = rows.toVector.sortBy(_._2).map { case (_, uid) =>
      if (seen.exists()) (uid, "duplicate")
      else {
        seen.update(true)
        (uid, "new")
      }
    }
    out.iterator
  }
}

/** Streaming NEAR-dup via LSH band keys — the streaming-native form of
  * the dedup gate's near tier (ST7, `check_duplicate.py:183-289` second
  * check, the dg_dedup_gate band probe as arriving state instead of a
  * batch join): each doc fans out to its band keys, state holds the
  * FIRST owner per band (min doc id within a micro-batch — the batch
  * gate's earlier-id-wins tie-break, so the claim is deterministic
  * under shuffle order), and any later doc sharing a band emits
  * `collision:<owner>` (a re-arrival of the owner itself collides with
  * its own id — the consumer's exact-tier distinguishes re-arrival from
  * true near-dup). At 100 TB the band-key state is hash-partitioned
  * across executors and RocksDB-backed, so a probe is a local point
  * lookup — the same corpus-never-shuffles-on-band property as the
  * batch gate, with TTL available to window the signature store.
  * Doc-level rollup (near-dup iff ANY band collides with a foreign
  * owner) belongs to the consuming foreachBatch, where the per-doc
  * outcomes of one micro-batch are co-present.
  */
class BandDedup
    extends StatefulProcessor[String, (String, Long), (Long, String, String)] {

  @transient private var owner: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(Long, String, String)] = {
    // Eager for the same reason as FingerprintDedup: the band must be
    // claimed even if downstream stops consuming early. Sorted by doc id
    // first: rows of one band within a micro-batch arrive in shuffle
    // order, so an arrival-order claim would make the owner
    // NONDETERMINISTIC across runs — the min-id claim is the batch
    // gate's "earlier id wins" rule (DedupGate batch-twin resolution),
    // making the drained outcome a pure function of the input set.
    val out = rows.toVector.sortBy(_._2).map { case (_, docId) =>
      if (owner.exists()) (docId, key, s"collision:${owner.get()}")
      else {
        owner.update(docId)
        (docId, key, "new")
      }
    }
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

  /** (doc_id, band keys) stream → (doc_id, band_key, outcome) stream,
    * outcome ∈ {new, collision:<first-owner-id>}. */
  def dedupByBands(
      in: Dataset[(Long, Seq[String])]): Dataset[(Long, String, String)] = {
    implicit val pairEnc =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.STRING, Encoders.STRING)
    in.flatMap { case (id, bands) => bands.map(b => (b, id)) }
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new BandDedup, TimeMode.None(),
        OutputMode.Update(), outEnc)
  }
}
