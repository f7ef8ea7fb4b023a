package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Structural-count probe for the Jaccard-prefix family at a scale
  * decade — the measurement companion to [[ScaleSynth]] and SCALE.md's
  * scaling tables. Wall-clock batteries (Bench) answer "how long"; this
  * answers the two questions the r15 verdict named as unmeasured at
  * decade 3: the PPJoin POSITION FILTER's selectivity and the verify's
  * SHUFFLE_HASH BUILD-SIDE size, plus the candidate-volume linearity
  * the decade-2 analysis rested on. All quantities are integer counts
  * or exact byte sums — no timing, so a loaded box cannot contaminate
  * them.
  *
  * Counted quantities (threshold/config identical to the
  * `dd_jaccard_prefix` query: t = 0.9, lang-blind):
  *  - `n_docs`, `n_sets`: corpus rows and distinct token sets — the
  *    SHJ build side is sets-sized by construction (collapseSets).
  *  - `build_mb`: exact bytes of the ENCODED build side (8 B per
  *    token id per set + 8 B rep key) — what each verify partition
  *    hash-builds; divide by shuffle partition count for the per-task
  *    working set the posture must keep in memory.
  *  - `cand_rows_nopos` / `cand_rows_pos`: rows FLOWING OUT of the
  *    prefix-token candidate join without / with the position filter,
  *    pre-distinct (pipelined counts — the pair stream is never
  *    shuffled to measure it). Their ratio IS the position filter's
  *    selectivity at this scale.
  *  - `cand_pairs_pos`: distinct candidate pairs (what the verify
  *    actually attaches arrays to). The no-position-filter distinct is
  *    deliberately NOT counted at decade 3 — it would shuffle the
  *    multi-billion-row raw stream just to reproduce a number the
  *    pre-distinct ratio already bounds.
  *
  * Usage: `runMain graft.ScaleProbe <sfDir> [out.json]` — prints one
  * JSON line (and optionally writes it) so runs land next to the bench
  * artifacts.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.DedupQueries
    val t = 0.9
    val docs = DedupQueries.prepared(spark, sfDir)
      .select(col("doc_id"), col("ws"))
    val nDocs = docs.count()
    val groups = DedupQueries.collapseSets(docs, byLang = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSets = groups.count()
    // encoded build side: one 8-byte xxhash64 id per token + the 8-byte
    // rep key — the exact bytes the verify's SHUFFLE_HASH builds
    val buildBytes = groups
      .select((size(col("ws")).cast("long") * 8L + 8L).as("b"))
      .agg(sum("b")).head.getLong(0)
    val reps = groups.select(col("rep_id"), col("ws"))
    def candRows(posFilter: Boolean): Long =
      DedupQueries.prefixRepCandidates(reps, t, byLang = false,
        posFilter = posFilter, distinctPairs = false).count()
    val candNoPos = candRows(posFilter = false)
    val candPos = candRows(posFilter = true)
    val candPairsPos = DedupQueries.prefixRepCandidates(reps, t,
      byLang = false).count()
    val line =
      f"""{"sf":"$sfDir","t":$t,"n_docs":$nDocs,"n_sets":$nSets,""" +
        f""""build_mb":${buildBytes / 1e6}%.1f,""" +
        s""""cand_rows_nopos":$candNoPos,"cand_rows_pos":$candPos,""" +
        f""""pos_filter_keep":${candPos.toDouble / candNoPos}%.4f,""" +
        s""""cand_pairs_pos":$candPairsPos}"""
    outFile.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), line))
    println(line)
    spark.stop()
  }
}
