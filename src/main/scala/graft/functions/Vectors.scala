package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float|double>` embedding columns —
  * SURVEY.md §2.9 F19 (cosine over signatures, `check_duplicate.py:128-151`)
  * generalized to the embedding-similarity operators the LLM-pipeline
  * surface needs (brute-force / bucketed ANN).
  *
  * All math is done in double with a strict left-to-right fold
  * (`aggregate`), matching DuckDB's sequential list kernels closely enough
  * that results agree to ~1e-15; oracle queries round to 4 decimals.
  */
object Vectors {

  /** Σ a_i·b_i as a left fold in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (reference thresholds 0.95 / 0.995,
    * `check_duplicate.py:19`, `record_handler.py:12`). Backed by the
    * native [[graft.plans.CosineSim]] expression — a single primitive
    * pass whose left-to-right accumulation is bit-identical to the
    * interpreted `aggregate(zip_with(...))` fold it replaced (the oracle
    * queries confirm this), but stays inside whole-stage codegen. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.Native.cosine_sim(a.cast("array<double>"),
      b.cast("array<double>"))

  /** Cosine rounded for cross-engine hash-stability. */
  def cosineRounded(a: Column, b: Column, scale: Int = 4): Column =
    round(cosine(a, b), scale)

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val dxy = x.cast("double") - y.cast("double")
      dxy * dxy
    }), lit(0.0), (acc, x) => acc + x))

  /** Sign-bucket width shared by every sign-LSH consumer
    * (dd_embed_cosine, dd_semdedup, sim_knn_graph, sim_ann_bucketed)
    * and interpolated into their DuckDB oracles, so engine and oracle
    * cannot drift.
    *
    * Fan-out math — THE 100 TB tuning knob: the bucket key partitions
    * the corpus into 2^bits cells, so the expected block is
    * corpus/2^bits and the within-block pair join does
    * ~corpus²/2^(bits+1) comparisons. 8 bits ⇒ 256 cells, right for the
    * test corpora (~10⁴–10⁵ vectors ⇒ blocks of 10²–10³). Growing the
    * corpus N× costs N²× comparisons at fixed width, so add ~2·log2(N)
    * bits to keep per-block fan-out constant (e.g. 10⁹ vectors want
    * ~20 bits). Config here — never at call sites — and recall trades
    * off: each added bit halves the chance a true near-dup pair shares
    * a bucket on a disagreeing component.
    *
    * r18: overridable via SPARK_GRAFT_SIGN_BITS — the deployment knob
    * the scale batteries turn (like SPARK_GRAFT_INITIAL_PARTITIONS /
    * _IO_CODEC in Bench): at the third sim decade (2M vectors) the
    * 8-bit default's within-block fan-out is ~7.8k vectors/block ⇒
    * ~1.6e10 comparisons, so the battery measures the widened posture
    * too. UNSET in the driver's per-round run (default 8, the graded
    * sf0.01/sf0.1 geometry). Safe by construction: every consumer —
    * signBucket AND the interpolated DuckDB oracle strings — reads
    * this one val in the same JVM, so engine and oracle cannot drift;
    * Bench records the effective value in its artifact as "sign_bits"
    * so a widened run self-identifies. */
  val SignBucketBits: Int =
    sys.env.get("SPARK_GRAFT_SIGN_BITS").flatMap(_.toIntOption)
      .filter(b => b >= 1 && b <= 62).getOrElse(8)

  /** Coarse LSH bucket for embedding vectors: sign bits of the first
    * `nBits` components (a random-hyperplane LSH specialization — the
    * planes are axis-aligned, which is deterministic and portable).
    * Vectors sharing a bucket are ANN candidates. */
  def signBucket(a: Column, nBits: Int = SignBucketBits): Column =
    // unrolled (nBits is compile-time): a plain when-sum instead of an
    // `aggregate` HOF — Spark 4.1's predicate pushdown fails to rewrite
    // lambda-captured attributes when an inferred isnotnull(bucket) is
    // pushed through the defining projection (binds the stale attribute
    // at execution), and the flat form also stays in whole-stage codegen
    (0 until nBits).map { i =>
      when(element_at(a, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
