package graft

/** Driver-contract guards: the per-module query/oracle maps merge with
  * `++`, where a name collision would silently SHADOW one module's
  * implementation with another's, and an oracle keyed to a missing
  * query would silently vanish from the correctness gate. Also mirrors
  * the driver's entry smoke check locally. */
class ContractSpec extends SparkSpec {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("RelationalQueries", operators.RelationalQueries.queries,
        operators.RelationalQueries.oracles),
      ("TextQueries", operators.TextQueries.queries,
        operators.TextQueries.oracles),
      ("DedupQueries", operators.DedupQueries.queries,
        operators.DedupQueries.oracles),
      ("SimilarityQueries", operators.SimilarityQueries.queries,
        operators.SimilarityQueries.oracles),
      ("OrpQueries", operators.OrpQueries.queries,
        operators.OrpQueries.oracles),
      ("EnrichQueries", operators.EnrichQueries.queries,
        operators.EnrichQueries.oracles),
      ("SourceSinkQueries", operators.SourceSinkQueries.queries,
        operators.SourceSinkQueries.oracles),
      ("Multimodal", operators.Multimodal.queries,
        operators.Multimodal.oracles),
      ("MixQueries", operators.MixQueries.queries,
        operators.MixQueries.oracles),
      ("CorpusQueries", operators.CorpusQueries.queries,
        operators.CorpusQueries.oracles),
      ("Layout", operators.Layout.queries, operators.Layout.oracles))

  test("no query name collides across modules (++ would silently shadow)") {
    val all = modules.flatMap { case (m, qs, _) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      dups.map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }
        .mkString(", "))
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a query (an orphan silently leaves the gate)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, orphans.mkString(", "))
  }

  test("oracle coverage stays near-total: only the documented native " +
    "hash paths may lack one") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val allowed = Set("dd_minhash_native", "dd_simhash_native",
      "dd_minhash_datasketch")
    assert(noOracle == allowed,
      s"unexpected oracle-less queries: ${(noOracle -- allowed).mkString(", ")}")
  }

  test("entry smoke: the flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("global plan hygiene: NO query plans a cartesian product, and " +
    "nested-loop joins appear only where a broadcast tiny side is the " +
    "intended shape (allowlist)") {
    // Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    // a ≤8-row broadcast codebook / 1-row scalar frame crossed onto the
    // corpus — the documented pattern, constant-size by construction.
    val bnljAllowed = Set(
      "sim_ann_ivf", "sim_ivf_delta", "sim_ann_pq", "sim_ann_pq_rerank",
      "sim_ann_recall",
      "sim_kmeans_step", "dd_semdedup", "sk_kmv_overlap",
      "ta_quality_trim", "mix_curriculum", "pipe_corpus_refinery",
      "samp_temperature",
      "ta_oov_rate", "ta_tfidf", "dq_audit", "mix_datacard_incr",
      "dd_decontaminate", "dd_bloom_decontaminate",
      // tiny broadcast EVAL-embedding set crossed onto the corpus scan —
      // the semantic decontamination probe (eval sets are small at any
      // corpus size; the corpus never broadcasts)
      "dd_embed_decontaminate", "sim_ann_bruteforce",
      "sim_ann_bucketed", "sim_knn_graph",
      // 1-row (n_docs, sum_dl) census crossed onto the term stats
      "ix_bm25",
      // composes ix_bm25's census attach + its own 1-row query-vector
      // broadcast crossed onto the embeddings scan (r20)
      "ix_rrf_fusion",
      // 1-row broadcast trigram-model MAP crossed onto the corpus scan
      "ta_lm_score",
      // substring-containment rules join: theta predicate by nature,
      // against a broadcast ≤dozen-phrase rule table
      "m5_doc_type",
      // 1-row max(doc_id)+1 ghost-offset scalar attach (the planted
      // near-dup ids derive from the corpus, never a fixed constant)
      "mm_phash_dedup", "pipe_mm_refinery",
      // 1-row (n, Σvalue) totals frame crossed onto the per-part
      // values — TPC-H Q11's mean-relative threshold attach
      "sql_q11",
      // 1-row token-id collision count crossed onto the rep-set frame —
      // the r15 encoded-verify injectivity guard (raise_error on any
      // xxhash64 vocabulary collision)
      "dd_jaccard_prefix", "dd_ngram_jaccard")
    // Constructing some frames triggers eager driver-side scalar jobs
    // (cluster_cc loop, bloom build) — sf0.001 keeps the sweep cheap.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = p.contains("CartesianProduct")
        val bnlj = p.contains("BroadcastNestedLoopJoin") &&
          !bnljAllowed.contains(name)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        if (cart) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
