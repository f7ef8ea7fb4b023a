package graft

import graft.operators.{DedupQueries, MixQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Invariants for the data-mixing + scrub operators beyond the DuckDB
  * oracle: split partitioning, packing bin budgets, scrub completeness.
  */
class MixSpec extends SparkSpec {

  test("samp_hash_split partitions every doc exactly once, ~80/10/10") {
    val df = MixQueries.queries("samp_hash_split")(spark, sf).cache()
    val total = df.count()
    assert(total == Tables.documents(spark, sf).count())
    val bySplit = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // hash buckets are uniform-ish; train must dominate by construction
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
    df.unpersist()
  }

  test("samp_stratified is deterministic and a strict subset per stratum") {
    val a = MixQueries.queries("samp_stratified")(spark, sf)
    val b = MixQueries.queries("samp_stratified")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val docs = Tables.documents(spark, sf)
    assert(a.count() > 0 && a.count() < docs.count())
  }

  test("pack_sequences: bins are contiguous and within-budget by start offset") {
    val packed = MixQueries.queries("pack_sequences")(spark, sf)
    // every doc's start offset lies inside its bin's 512-token budget
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val bad = packed
      .withColumn("run", sum("n_tok").over(w))
      .filter(!(col("run") - col("n_tok") >= col("bin") * 512 &&
        col("run") - col("n_tok") < (col("bin") + 1) * 512))
    assert(bad.count() == 0)
    // bins per lang start at 0 and have no gaps
    val gaps = packed.groupBy("lang")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(gaps.count() == 0)
  }

  test("ta_pii_scrub leaves no raw email/ip/phone and counts redactions") {
    val df = TextQueries.queries("ta_pii_scrub")(spark, sf).cache()
    assert(df.filter(col("scrubbed").rlike("@")).count() == 0)
    assert(df.filter(col("scrubbed").rlike("\\+[0-9]")).count() == 0)
    assert(df.filter(
      col("scrubbed").rlike("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]"))
      .count() == 0)
    // every doc had exactly one email, one ip, one phone injected
    assert(df.filter(col("n_redactions") =!= 3).count() == 0)
    df.unpersist()
  }

  test("dd_decontaminate flags exactly the docs sharing an 8-gram with the benchmark slice") {
    val flagged = DedupQueries.queries("dd_decontaminate")(spark, sf)
    // n_shared is positive and flagged docs are outside the benchmark
    assert(flagged.filter(col("n_shared") <= 0).count() == 0)
    assert(flagged.filter(col("doc_id") < 20).count() == 0)
  }
}
