package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Versioned upsert into the document/graph store — SURVEY.md §2.10
  * ST2–ST6 (reference `misc/stream_update_process/record_handler.py`):
  *
  *  - insert-if-absent (new docs get version 1)              ST6
  *  - in-place merge when content is nearly identical         ST5
  *  - SCD-2 version fork when content changed materially:     ST4
  *    new row version+1, old row's status flipped to archive
  *  - pure attribute update when only metadata changed        ST3
  *
  * The reference mutates TypeDB row-by-row; on Spark the same semantics
  * are a deterministic join + union rewrite of the table per batch
  * (Delta-MERGE-shaped: at 100 TB each branch is a keyed equi-join on
  * `uid`, so the rewrite shuffles only on the merge key; with a real
  * lakehouse table format the same frames feed `MERGE WHEN MATCHED`).
  *
  * Similarity is the caller's column (`sim` ∈ [0,1] on the incoming
  * frame, cosine of signature vectors in the reference —
  * `record_handler.py:28-34`); the fork threshold is 0.995
  * (`record_handler.py:12`).
  */
object GraphMerge {

  val VersionForkThreshold = 0.995 // record_handler.py:12

  /** Merge `incoming` into `current`.
    *
    * @param current  store: one live row per uid (+ archived history);
    *                 columns: uid, payload..., version, status
    * @param incoming batch: uid, payload..., sim (similarity to the
    *                 current live row, null/1.0 when uid is new)
    * @param payloadCols payload column names common to both frames
    */
  def merge(current: DataFrame, incoming: DataFrame,
      payloadCols: Seq[String]): DataFrame = {
    // r20 review: a store row with NULL status must not vanish — both
    // `=!= "archive"` and `=== "archive"` are null for it, which would
    // silently drop it from the full-table rewrite. Policy: unknown
    // status reads as live (published), the insert branches' own
    // default.
    val statusOrLive = coalesce(col("status"), lit("published"))
    val live = current.filter(statusOrLive =!= "archive")
    val archived = current.filter(statusOrLive === "archive")

    // r20 review: the store invariant is ONE live row per uid, so two
    // incoming rows routed onto one uid within a single batch (the
    // gate's coalesce(matched_node_id, uid) routing does this when two
    // batch docs both match the same corpus node) must collapse BEFORE
    // the branch joins — otherwise both match the same live row and
    // the winning branch emits TWO live rows with the same version,
    // fanning out every later merge. A batch has no arrival order, so
    // the collapse is a deterministic rule, not last-writer-wins: the
    // LOWEST-sim row survives (nulls first — the same "unknown ⇒
    // materially changed" lossless bias as the fork policy below),
    // ties broken by the payload columns' total order so replays agree
    // bit-for-bit. The window partitions the INGEST-sized frame only.
    val batchW = org.apache.spark.sql.expressions.Window.partitionBy("uid")
      .orderBy(col("sim").asc_nulls_first +:
        payloadCols.map(col(_).asc): _*)
    val incomingOne = incoming
      .withColumn("_rk", row_number().over(batchW))
      .filter(col("_rk") === 1).drop("_rk")

    val in = incomingOne.alias("in")
    val cur = live.alias("cur")
    val joined = in.join(cur, col("in.uid") === col("cur.uid"), "left")

    def inCols = payloadCols.map(c => col(s"in.$c").as(c))

    // A matched row with null sim must not vanish: `null < t` and
    // `null >= t` are both null, which would drop it from BOTH branches
    // while the left_anti below still excludes its uid. Policy: unknown
    // similarity ⇒ treat as materially changed (fork) — lossless, since
    // SCD-2 keeps both rows.
    val simOrZero = coalesce(col("in.sim"), lit(0.0))

    // ST6: unseen uid → insert version 1.
    val inserts = joined.filter(col("cur.uid").isNull)
      .select((col("in.uid").as("uid") +: inCols) :+
        lit(1L).as("version") :+ lit("published").as("status"): _*)

    // ST4: matched + changed materially → fork: new row version+1 …
    // (r20 review: ONE filtered frame feeds both the forked rows and
    // the archive flip — the predicate written twice could silently
    // desynchronize the two sets under a future edit)
    val forkRows = joined
      .filter(col("cur.uid").isNotNull && simOrZero < VersionForkThreshold)
    val forked = forkRows
      .select((col("in.uid").as("uid") +: inCols) :+
        (col("cur.version") + 1L).as("version") :+
        lit("published").as("status"): _*)

    // … and the superseded live row flips to archive.
    val forkedUids = forkRows.select(col("cur.uid").as("uid"))
    val newlyArchived = live.join(forkedUids, Seq("uid"), "left_semi")
      .withColumn("status", lit("archive"))

    // ST3/ST5: matched + near-identical → in-place attribute overwrite
    // (keep version).
    val updated = joined
      .filter(col("cur.uid").isNotNull && simOrZero >= VersionForkThreshold)
      .select((col("in.uid").as("uid") +: inCols) :+
        col("cur.version").as("version") :+ col("cur.status").as("status"): _*)

    // Untouched live rows pass through.
    val untouched = live.join(in.select(col("uid")), Seq("uid"), "left_anti")

    val cols = ("uid" +: payloadCols) :+ "version" :+ "status"
    Seq(archived, newlyArchived, untouched, updated, inserts, forked)
      .map(_.select(cols.map(col): _*))
      .reduce(_ unionByName _)
  }
}
