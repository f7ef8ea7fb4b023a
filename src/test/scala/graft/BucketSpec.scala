package graft

import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's "what changes at 1000×" claim: persisting the
  * big fact tables bucketed by their join key removes the join shuffle
  * entirely — both sides are read pre-partitioned (and pre-sorted), so
  * the sort-merge join needs no Exchange on the join key. This is the
  * co-located-join posture the 100 TB deployment runs on.
  */
class BucketSpec extends SparkSpec {

  test("bucketed fact tables join with zero exchange on the join key") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real distributed join: at test scale everything would
      // otherwise broadcast, proving nothing about the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed left side must not re-shuffle on the join key")
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed right side must not re-shuffle on the join key")
      // sortBy at write time also removes the merge-join's sort
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
