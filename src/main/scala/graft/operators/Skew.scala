package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — the 100 TB posture for hot keys (builder brief:
  * "skewed keys → salting or AQE skew-join").
  *
  * Two-phase salted aggregation: partial aggregate on (key, salt) spreads
  * one hot key over `salts` reducers, the final aggregate on (key) merges
  * the partials. The salt must be DETERMINISTIC (derived from a secondary
  * column, not rand()) so results are reproducible and oracle-checkable.
  * AQE's skew-join handling covers the join case at runtime; salting is
  * the static insurance for aggregations whose key histogram is known to
  * be heavy-tailed (e.g. word counts over web text).
  */
object Skew {

  /** count per key, salted `salts` ways on `saltSource`. */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column,
      salts: Int): DataFrame =
    df.groupBy(key.as("key"), pmod(hash(saltSource), lit(salts)).as("salt"))
      .agg(count("*").as("partial_n"))
      .groupBy("key")
      .agg(sum("partial_n").as("n"))

  /** sum(value) per key, salted. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      saltSource: Column, salts: Int): DataFrame =
    df.groupBy(key.as("key"), pmod(hash(saltSource), lit(salts)).as("salt"))
      .agg(sum(value).as("partial_s"))
      .groupBy("key")
      .agg(sum("partial_s").as("s"))
}
