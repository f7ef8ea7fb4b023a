package graft.streaming

import graft.operators.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The component-assignment store maintained under Structured
  * Streaming — the CC analogue of [[GateStoreLoop]] (reference
  * contract: the dedup gate's stream loop clusters what it gates;
  * `lambdas/check_duplicate/check_duplicate.py:183-289` classifies at
  * ingest and `misc/stream_update_process/record_handler.py:103-147`
  * lands the maintenance): each micro-batch of near-dup EDGES folds
  * into the stored assignment via
  * [[graft.operators.DedupQueries.ccApplyDelta]], and what lands on
  * disk per batch is the INGEST-SIZED changed-row set (new vertices +
  * vertices whose canonical moved — bounded by touched components),
  * never the corpus-sized assignment.
  *
  * On-disk layout under `dir`:
  * {{{
  *   assign_-1/        the initial full assignment (base build)
  *   gen_<batchId>/    the batch's changed rows (doc_id, canonical_id)
  * }}}
  * Current assignment = assign_-1 overlaid by every COMMITTED
  * generation in batchId order (later generation wins per doc_id) —
  * an LSM overlay where each layer is batch-sized, so reads pay one
  * anti-join per open generation (AQE runtime-sizes each build side;
  * see [[state]]) and [[maybeCompact]] bounds that fan-out by folding
  * layers into a new full assignment (the posture's only corpus-sized
  * write).
  *
  * REDELIVERY SAFETY (checkpointed foreachBatch: a batch that failed
  * mid-write is re-delivered with the SAME batchId): a batch folds
  * against generations STRICTLY BELOW its own id, writes its artifact
  * with overwrite into its own batchId-keyed dir, and parquet's
  * _SUCCESS is the commit marker — a half-written generation is
  * invisible to [[state]] and simply overwritten on re-run, and a
  * COMMITTED generation re-derives bit-stably because its inputs
  * (generations below) cannot have changed. On top of the layout
  * discipline, the fold itself is idempotent (ccApplyDelta on
  * already-merged edges yields an EMPTY changed-row set), so even an
  * out-of-contract duplicate delivery under a fresh id is a no-op
  * layer. StreamingSpec drives all of this end-to-end.
  *
  * CONCURRENCY CONTRACT (same shape as [[GateStoreLoop]]'s): one
  * writer — the streaming query — owns all writes; concurrent writers
  * are out of contract. Concurrent readers are safe by resolution:
  * [[state]] resolves only `_SUCCESS`-committed layers, superseded
  * artifacts stay on disk, and a forward compaction writes an
  * `assign_<g>` that did not previously exist, so a racing reader
  * sees either the old overlay or the new fold — the same assignment
  * either way (compaction equivalence is StreamingSpec-pinned). Only
  * a crash-recovery RE-fold overwrites an existing committed dir; a
  * reader mid-scan of exactly that dir can fail and must re-resolve.
  */
object CcStoreLoop {

  private def fs(dir: String) = new java.io.File(dir)

  // r20 review: the shared listing (StoreGens) — this was the third
  // hand-copied list/strip/parse/marker walk across the two loops
  private def committed(dir: String, prefix: String): Seq[Long] =
    StoreGens.committed(dir, prefix, "_SUCCESS")

  /** Highest COMPLETE full-assignment generation (-1 = initial build).
    * Loud when none exists: [[init]] never ran or never committed. */
  private def baseGen(dir: String): Long = {
    val gens = committed(dir, "assign_")
    if (gens.isEmpty)
      throw new IllegalStateException(
        s"CcStoreLoop: no committed assignment under $dir — run init() " +
          "first (a missing base is an absent store, not an empty graph)")
    gens.max
  }

  /** Write the initial assignment from the base edge list. Clears any
    * pre-existing committed layers first: re-initializing a previously
    * used store dir must yield a FRESH store, not a fresh base that
    * [[state]] silently overlays with stale generations (id > -1) from
    * the dir's earlier life (ADVICE r13 — callers previously had to
    * remember to wipe the dir themselves). */
  def init(spark: SparkSession, baseEdges: DataFrame, dir: String): Unit = {
    fs(dir).mkdirs()
    Option(fs(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("gen_") ||
        f.getName.startsWith("assign_"))
      .foreach(deleteRecursively)
    val s = DedupQueries.ccSession(spark)
    DedupQueries.ccAssignments(
        DedupQueries.truncatedDf(onSession(s, baseEdges), eager = true))
      // r21 (guide §6): size-targeted files via AQE rebalance — the
      // assignment is corpus-sized; without the hint the write inherits
      // the CC loop's partitioning (dozens of tiny files at bench scale,
      // per-file open cost on every later overlay read)
      .hint("rebalance").write.mode("overwrite").parquet(s"$dir/assign_-1")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** The stored assignment as of generations strictly below `below`
    * (default: everything committed) — base overlaid by each committed
    * generation in order, later layer winning per doc_id. The overlay
    * anti-joins carry NO static `broadcast()` hint (r18): a layer is
    * batch-sized in the per-batch posture, but a backfill tranche is
    * one layer too, and r17's ~sf100 battery proved a forced broadcast
    * of a frame with no size contract OOMs under production memory
    * pressure while passing every clean-room test. The layers read from
    * parquet, so AQE runtime-sizes each build: ingest-scale id sets
    * still broadcast at runtime; a backfill-scale layer degrades to a
    * keyed anti-join instead of dying. */
  def state(spark: SparkSession, dir: String,
      below: Long = Long.MaxValue): DataFrame = {
    val g = baseGen(dir)
    val gens = committed(dir, "gen_").filter(id => id > g && id < below)
    gens.foldLeft(spark.read.parquet(s"$dir/assign_$g")) { (acc, id) =>
      val layer = spark.read.parquet(s"$dir/gen_$id")
      acc.join(layer.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(layer)
    }
  }

  /** The foreachBatch handler: fold the batch's edges into the stored
    * assignment, land ONLY the changed rows as this batch's
    * generation. Pass to
    * `StreamPipeline.run(source, cp)(CcStoreLoop.handleBatch(dir))`;
    * the batch frame must carry (a_id, b_id). */
  def handleBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val b = batch.localCheckpoint(true)
    if (b.isEmpty) return
    val s = DedupQueries.ccSession(spark)
    // probe state BELOW this batch id: a redelivered batch must fold
    // against exactly what it saw the first time, never its own layer.
    // Built directly ON the cc session (state takes the session) — only
    // the externally supplied batch frame needs the onSession rebind;
    // round-tripping the corpus-sized overlay through RDD rows would
    // pay a full decode/re-encode per micro-batch for nothing.
    val base = DedupQueries.truncatedDf(
      state(s, dir, below = batchId), eager = true)
    DedupQueries.ccApplyDelta(s, base, onSession(s, b), deltaOnly = true)
      // r21: NO rebalance on the per-batch layer (measured: the extra
      // exchange costs more than the small files it saves at batch
      // cadence; corpus-sized writes — init/compaction — do rebalance)
      .write.mode("overwrite").parquet(s"$dir/gen_$batchId")
  }

  /** Fold committed generations below `upTo` into a new full
    * assignment — the posture's only corpus-sized write. From INSIDE
    * the stream pass `upTo = batchId` (the current batch's offset is
    * uncommitted; folding its layer would make a redelivery fold
    * against its own effects — same contract as
    * [[GateStoreLoop.maybeCompact]]). */
  def maybeCompact(spark: SparkSession, dir: String, maxOpenGenerations: Int,
      upTo: Long = Long.MaxValue): Boolean = {
    val g = baseGen(dir)
    val open = committed(dir, "gen_").filter(id => id > g && id < upTo)
    // nonEmpty guard: a degenerate threshold (<= 0) with nothing open
    // must no-op, not crash on open.max — same contract as the gate
    // loop's compact
    if (open.nonEmpty && open.size >= maxOpenGenerations) {
      state(spark, dir, below = upTo)
        .hint("rebalance")
        .write.mode("overwrite").parquet(s"$dir/assign_${open.max}")
      true
    } else false
  }

  /** Frames built on the caller's session re-bind onto the cc child
    * session so every plan they feed executes under ccSession's rule
    * exclusion (a frame runs under the session it belongs to, not the
    * one passed alongside it). */
  private def onSession(s: SparkSession, df: DataFrame): DataFrame =
    s.createDataFrame(df.rdd, df.schema)
}
