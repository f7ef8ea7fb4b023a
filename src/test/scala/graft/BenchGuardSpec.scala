package graft

import graft.functions.Hashes
import graft.operators.{DedupQueries, MinHashPipeline, OrpQueries}
import org.apache.spark.sql.functions._

/** Structure pins for the bench-dominating gate/jaccard family at
  * sf0.01. Wall time on this box is ±2× contention noise (SCALE.md),
  * but candidate-pair COUNTS are a pure function of code + data — a
  * plan or semantics regression shows up as count drift even on a box
  * where timings can't be trusted (the r12 official-bench anomaly hit
  * exactly these queries; their outputs were bit-stable throughout,
  * which is what localized the problem to the environment rather than
  * the code). The r13 bench artifact also records per-query
  * rows/exchanges at sf0.1; this spec is the finer-grained sf0.01 pin
  * that runs in every `sbt test`.
  */
class BenchGuardSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("output cardinality pins: the pair-producing dedup queries are " +
      "bit-stable at sf0.01") {
    assert(DedupQueries.queries("dd_jaccard_prefix")(spark, sf01)
      .count() == 9020L)
    assert(DedupQueries.queries("dd_ngram_jaccard")(spark, sf01)
      .count() == 2359L)
    assert(DedupQueries.queries("dd_minhash_lsh")(spark, sf01)
      .count() == 364L)
  }

  test("gate outcome distribution pin at sf0.01: 40 duplicate / 17 new " +
      "/ 43 version, identical across all four physical postures") {
    val expected = Map("duplicate" -> 40L, "new" -> 17L, "version" -> 43L)
    for (q <- Seq("dg_dedup_gate", "dg_gate_delta")) {
      val dist = OrpQueries.queries(q)(spark, sf01)
        .groupBy("outcome").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dist == expected, s"$q outcome distribution drifted: $dist")
    }
  }

  test("gate candidate-pair structure pin at sf0.01: the band probe " +
      "yields exactly 233 distinct corpus pairs (from 416 raw band " +
      "hits) and 1135 distinct batch pairs") {
    // The fixture, reconstructed from public pieces — counts the pairs
    // BEFORE the similarity verify, i.e. the exact row count flowing
    // into verifyOncePerPair's dedup aggregate. DuckDB-independently
    // derived from the oracle's own CTEs (233/1135/416).
    val docs = Tables.documents(spark, sf01)
    val inc0 = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("uid"),
        when(col("doc_id") % 10 === 0,
          concat(lit("completely different content block "), col("doc_id")))
          .otherwise(col("text")).as("itext"))
    val corp0 = docs.filter(col("doc_id") % 10 =!= 9)
      .select(col("doc_id").as("node_id"), col("text"))
    val incSig = MinHashPipeline.signatures(inc0, "uid", col("itext"))
    val corpSig = MinHashPipeline.signatures(corp0, "node_id", col("text"))
    def banded(df: org.apache.spark.sql.DataFrame, id: String) =
      df.select(col(id),
        explode(Hashes.bands(col("sig"), 4, 4)).as("band"))
        .select(col(id), col("band.band_id"), col("band.band_key"))
    val bi = banded(incSig, "uid")
    val bc = banded(corpSig, "node_id")
    val corpHits = bi.join(bc, Seq("band_id", "band_key"))
    assert(corpHits.count() == 416L,
      "raw corpus band hits drifted — banding or signatures changed")
    assert(corpHits.select("uid", "node_id").distinct().count() == 233L,
      "distinct corpus candidate pairs drifted")
    val batchPairs = bi.alias("a").join(bi.alias("b"), Seq("band_id", "band_key"))
      .filter(col("a.uid") > col("b.uid"))
      .select(col("a.uid"), col("b.uid").as("m")).distinct()
    assert(batchPairs.count() == 1135L,
      "distinct batch candidate pairs drifted")

    // r14 CLASS collapse: the gate probes once per signature CLASS and
    // attaches members afterwards, so the volume reaching the verify is
    // class-pairs + within-class rows, NOT the member-quadratic 1135.
    // The collapse is what keeps boilerplate cliques linear at scale
    // (the sf0.1→sf1 measurement: member pairs grew 75×, classes ~10×).
    import org.apache.spark.sql.expressions.Window
    val clsOf = incSig
      .withColumn("cls", min("uid").over(
        Window.partitionBy(array_join(col("sig"), "_"))))
    assert(clsOf.filter(col("uid") === col("cls")).count() == 67L,
      "signature-class count drifted (100 batch docs → 67 classes)")
    assert(clsOf.filter(col("uid") =!= col("cls")).count() == 33L,
      "within-class member (twin) row count drifted")
    val br = banded(clsOf.filter(col("uid") === col("cls")), "uid")
    val classPairs = br.alias("a").join(br.alias("b"), Seq("band_id", "band_key"))
      .filter(col("a.uid") > col("b.uid"))
      .select(col("a.uid"), col("b.uid").as("m")).distinct()
    assert(classPairs.count() == 112L,
      "class-level batch pair count drifted — 112 class pairs stand in " +
        "for the 1135 member pairs the pre-r14 gate verified")
  }
}
