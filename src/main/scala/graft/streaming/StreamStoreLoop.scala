package graft.streaming

import graft.operators.DedupGate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dedup gate's PRODUCTION posture wired through Structured
  * Streaming — ST7's per-batch loop end-to-end (reference contract:
  * `lambdas/check_duplicate/check_duplicate.py:183-289` classifies each
  * arriving document against the stored corpus at ingest;
  * `misc/stream_update_process/record_handler.py:103-147` writes each
  * outcome back to the store): every micro-batch is classified against
  * base + accumulated delta generations, its maintenance lands as
  * batchId-keyed DELTA ARTIFACTS beside the base (never a corpus-sized
  * rewrite), and periodic COMPACTION folds the generations into a new
  * base — the only moment the corpus-sized band shuffle recurs.
  *
  * On-disk layout under `dir`:
  * {{{
  *   base_<g>/             compacted base covering generations <= g
  *                         (base_-1 is the initial store)
  *   gen_<batchId>/delta   banded rows of the batch's winners
  *   gen_<batchId>/tombs   node ids replaced or retired by this batch
  *   gen_<batchId>/outcomes the batch's classified rows (the API output)
  * }}}
  * Current state = the highest `base_<g>` plus every `gen_<i>` with
  * `i > g`, ordered by batchId — exactly the `generations` argument of
  * [[DedupGate.classifyStoredDeltas]].
  *
  * REDELIVERY SAFETY (the checkpointed foreachBatch contract — a batch
  * that failed mid-write is delivered again with the SAME batchId):
  * artifacts land in batchId-keyed directories with overwrite mode, and
  * a batch only probes generations STRICTLY BELOW its own id — so a
  * half-written artifact from a failed attempt is invisible to its own
  * re-run and simply overwritten. Replaying any prefix of batches is a
  * pure no-op: outcomes are a function of (base, earlier generations,
  * batch), none of which a redelivery mutates.
  */
object GateStoreLoop {

  private def fs(dir: String) = new java.io.File(dir)

  /** Highest COMPLETE compacted base generation under `dir` (-1 when
    * only the initial base exists, written as `base_-1`). Completeness
    * is the parquet commit marker — a fold interrupted mid-write leaves
    * no `_SUCCESS`, so the previous base stays authoritative. */
  private def baseGen(dir: String): Long =
    fs(dir).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("base_"))
      .map(_.stripPrefix("base_").toLong)
      .filter(g => new java.io.File(s"$dir/base_$g/_SUCCESS").exists())
      .max

  /** (base frame, ordered open generations) as of now. */
  def state(spark: SparkSession, dir: String)
      : (DataFrame, Seq[(Long, DataFrame, DataFrame)]) = {
    val g = baseGen(dir)
    val gens = fs(dir).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("gen_"))
      .map(_.stripPrefix("gen_").toLong).filter(_ > g).sorted
      .filter(id => new java.io.File(s"$dir/gen_$id/tombs/_SUCCESS").exists())
    (spark.read.parquet(s"$dir/base_$g"),
      gens.map(id => (id,
        spark.read.parquet(s"$dir/gen_$id/delta"),
        spark.read.parquet(s"$dir/gen_$id/tombs"))))
  }

  /** Write the initial store as generation -1. */
  def init(store: DataFrame, dir: String): Unit = {
    fs(dir).mkdirs()
    store.write.mode("overwrite").parquet(s"$dir/base_-1")
  }

  /** The foreachBatch handler: classify, derive the delta, persist the
    * batch's artifacts. Pass directly to
    * `StreamPipeline.run(source, cp)(GateStoreLoop.handleBatch(dir, 4, 4))`.
    * The batch frame must carry (uid, sig, meta_key).
    */
  def handleBatch(dir: String, numBands: Int, rowsPerBand: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // the gate DAG reads the batch from several branches (probe,
    // self-join, meta attach) — localCheckpoint pins the micro-batch's
    // rows and truncates the streaming lineage so every branch re-reads
    // materialized partitions (bounded: one ingest batch)
    val b = batch.localCheckpoint(true)
    if (b.isEmpty) return
    val (base, gens) = state(spark, dir)
    val usable = gens.filter(_._1 < batchId).map(g => (g._2, g._3))
    // materialize the classification ONCE (ingest-sized, bounded): the
    // outcome frame is read back by resolveTargets' convergence probes
    // and by all three artifact writes — without the pin each of those
    // actions would re-run the corpus probe, turning one gate pass into
    // five
    val outcomes = DedupGate.classifyStoredDeltas(
      b, base, usable, numBands, rowsPerBand).localCheckpoint(true)
    // archive flips travel a separate maintenance channel; the stream
    // loop itself retires nodes only via version replacement
    val noFlips = outcomes.select(col("matched_node_id").as("node_id"))
      .limit(0)
    val (append, tombs) = DedupGate.outcomesDelta(
      b, outcomes, noFlips, numBands, rowsPerBand)
    // tombs LAST: state() gates a generation on tombs/_SUCCESS, so a
    // crash between writes leaves an invisible (and overwritable)
    // half-generation, never a probe against delta-without-tombstones
    outcomes.write.mode("overwrite").parquet(s"$dir/gen_$batchId/outcomes")
    append.write.mode("overwrite").parquet(s"$dir/gen_$batchId/delta")
    tombs.write.mode("overwrite").parquet(s"$dir/gen_$batchId/tombs")
  }

  /** Compaction POLICY for the streaming loop: fold when the open
    * generation count reaches `maxOpenGenerations`. Each open
    * generation adds one broadcast probe to every later batch's
    * classify, so the per-batch cost grows linearly in open
    * generations while compaction costs one corpus-sized fold —
    * bounding the count trades a periodic corpus shuffle for a bounded
    * probe fan-out, the standard LSM posture. Call after
    * [[handleBatch]] in the same foreachBatch (compaction is
    * idempotent and crash-safe: an interrupted fold leaves the old
    * base authoritative because `state` resolves to the highest
    * COMPLETE base).
    */
  def maybeCompact(spark: SparkSession, dir: String,
      maxOpenGenerations: Int): Boolean = {
    val (_, gens) = state(spark, dir)
    if (gens.size >= maxOpenGenerations) { compact(spark, dir); true }
    else false
  }

  /** Fold every open generation into a new compacted base — the
    * periodic corpus-shuffle event of the posture. Old artifacts stay on
    * disk (readers race-free: `state` always resolves to the highest
    * base), so compaction is an append-only metadata flip; garbage
    * collection of superseded dirs is an offline janitor concern.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val (base, gens) = state(spark, dir)
    if (gens.isEmpty) return
    val folded = gens.foldLeft(base) { case (s, (_, append, tombs)) =>
      s.join(broadcast(tombs), Seq("node_id"), "left_anti")
        .unionByName(append)
    }
    folded.write.mode("overwrite").parquet(s"$dir/base_${gens.map(_._1).max}")
  }

  /** All outcomes written so far (the loop's queryable API output). */
  def outcomes(spark: SparkSession, dir: String): DataFrame = {
    val ids = fs(dir).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("gen_"))
      .map(_.stripPrefix("gen_").toLong).sorted
      .filter(id => new java.io.File(s"$dir/gen_$id/outcomes/_SUCCESS").exists())
    ids.map(id => spark.read.parquet(s"$dir/gen_$id/outcomes"))
      .reduce(_ unionByName _)
  }
}
