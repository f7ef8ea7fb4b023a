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
}
