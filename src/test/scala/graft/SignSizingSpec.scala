package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Contract pins for the r19 sign-LSH width self-sizing
  * ([[Vectors.sizedSignBitsFor]]): the derived width must (a) equal
  * the floor at graded scales so the static oracles stay exact,
  * (b) reproduce the r18 battery's hand-set 12-bit posture at the
  * decade-3 count WITHOUT the env var, (c) escalate past the
  * count-derived width on skewed occupancy via the exact Σ s·(s−1)
  * audit, and (d) FAIL LOUDLY instead of submitting a quadratic join
  * when no width can bound the candidate stream. */
class SignSizingSpec extends SparkSpec {
  import spark.implicits._

  test("count-derived width: floor at graded counts; 12 bits at the " +
    "r18 decade-3 count (the posture a human previously had to set)") {
    assume(!Vectors.SignBitsForced, "env override active — sizing is off")
    assert(Vectors.sizedSignBits(500) == Vectors.SignBucketBits)
    assert(Vectors.sizedSignBits(60000) == Vectors.SignBucketBits)
    // the last count that still fits the floor, and the first that grows
    assert(Vectors.sizedSignBits(512L << 8) == 8)
    assert(Vectors.sizedSignBits((512L << 8) + 256) == 9)
    // the r18 battery's decade-3 corpus (2M vectors): the hand-set
    // SPARK_GRAFT_SIGN_BITS=12 posture, now derived
    assert(Vectors.sizedSignBits(2000000L) == 12)
  }

  test("graded-scale invariance: the derived width over the real sf0.001 " +
    "embeddings equals the floor (static oracle geometry unchanged)") {
    assume(!Vectors.SignBitsForced, "env override active — sizing is off")
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
    assert(Vectors.sizedSignBitsFor(e, col("v"), "test-graded")
      == Vectors.SignBucketBits)
  }

  test("occupancy audit escalates past the count-derived width when the " +
    "leading components' signs are skewed (deterministic fixture)") {
    assume(!Vectors.SignBitsForced, "env override active — sizing is off")
    // 160k vectors, dim 20: components 1..9 all-positive (every vector
    // shares the 9-bit prefix bucket), components 10..20 sign-randomized
    // by xxhash64 (deterministic). Count-derived width is 9
    // (160000 >> 9 = 312 ≤ 512) but the 9-bit occupancy is ONE bucket —
    // the audit must walk up until the exact pair count fits the bound
    // (analytically: n²/2^(b-9) ≤ 4·511·n → b = 16; xxhash64 parity is
    // near-balanced so the exact count lands within a bit of that).
    val vecs = spark.range(160000).select(
      transform(sequence(lit(1), lit(20)), i =>
        when(i <= 9, lit(1.0)).otherwise(
          when(pmod(xxhash64(col("id"), i), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0)))).as("v"))
    val chosen = Vectors.sizedSignBitsFor(vecs, col("v"), "test-skew-esc")
    assert(chosen >= 15 && chosen <= 17,
      s"expected escalation to ~16 bits, got $chosen")
    assert(chosen > Vectors.sizedSignBits(160000),
      "the audit must have escalated past the count-derived width")
  }

  test("pathological sign skew fails the plan build loudly instead of " +
    "submitting the quadratic join") {
    assume(!Vectors.SignBitsForced, "env override active — sizing is off")
    // every vector identical in sign on ALL components: no width can
    // split the single bucket, so the candidate count stays ~n² at
    // every candidate width and the derivation must throw with guidance
    val vecs = spark.range(140000)
      .select(transform(sequence(lit(1), lit(20)), _ => lit(1.0)).as("v"))
    val e = intercept[IllegalStateException] {
      Vectors.sizedSignBitsFor(vecs, col("v"), "test-skew-fatal")
    }
    assert(e.getMessage.contains("SPARK_GRAFT_SIGN_BITS"),
      s"failure must carry the override guidance: ${e.getMessage}")
  }
}
