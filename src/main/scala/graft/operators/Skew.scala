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

  /** Replicate-salt a self equi-join against band-key skew (the LSH hot
    * spot: near-identical boilerplate docs share every band, so one
    * band_key can hold a large clique and its n² pair work lands on ONE
    * reducer).
    *
    * Semantics-preserving: side B gets ONE deterministic salt per row
    * (`hash(idCol) % salts`), side A is replicated across ALL salt values
    * — every (a, b) row pair meets on exactly one (key..., salt) tuple,
    * so the joined output is row-identical to the unsalted join while a
    * hot key's work spreads over `salts` reducers. Shuffle volume for
    * side A grows ×salts — keep the replicated side slim (ids + keys
    * only; see [[DedupQueries]]' slim banding).
    *
    * Returns (aDf′, bDf′, joinKeys′) to feed `aDf′.join(bDf′, joinKeys′)`.
    */
  def saltedSelfJoinSides(df: DataFrame, joinKeys: Seq[String],
      idCol: String, salts: Int): (DataFrame, DataFrame, Seq[String]) = {
    val a = df.withColumn("salt",
      explode(lit((0 until salts).toArray)))
    val b = df.withColumn("salt", pmod(hash(col(idCol)), lit(salts)))
    (a, b, joinKeys :+ "salt")
  }
}
