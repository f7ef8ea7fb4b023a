package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata dir by
  * STRUCTURE-PRESERVING replication — the harness behind SCALE.md's
  * empirical scaling table (`/root/testdata` is read-only and tops out
  * at sf0.1, so ~sf1 is derived, not generated).
  *
  * Naive self-union would NOT preserve the workloads' geometry: an
  * identical text copied under a new doc_id collides with its original
  * in every MinHash band, so cross-replica duplicate cliques grow
  * quadratically and a "10× data" corpus carries ~100× the candidate
  * pairs — measuring that measures the wrong workload. Instead each
  * replica is transformed by a per-replica bijection that PRESERVES
  * intra-replica similarity structure exactly and randomizes
  * cross-replica similarity:
  *
  *  - documents: a per-replica rotation of the letter alphabet
  *    (`translate`). Shingle-set equality between two docs is invariant
  *    under any character bijection applied to both, so every replica
  *    has an ISOMORPHIC near-dup graph; the rotated shingles hash
  *    independently, so cross-replica band collisions are
  *    chance-level (measured: ~3.5k of 4.5M pairs). doc_id offsets are
  *    multiples of 30 = lcm(5,10,15), preserving the `doc_id % k`
  *    residues the gate fixtures key on.
  *
  *    The rotations are VETTED, not sequential: isomorphism preserves
  *    the true-Jaccard structure, but the 16-perm ESTIMATE rides the
  *    hash landscape of each replica's shingle universe, and with the
  *    synthetic corpus's ~30-word vocabulary that landscape is small
  *    enough for a bad roll — rotation 8 inflates the >=0.5-estimate
  *    pair count 82x (43k -> 3.5M: a handful of very common shingles
  *    draw tiny hash values across many permutations, correlating
  *    every doc's minima), and 22 is as bad. The list below keeps the
  *    ten rotations whose qualifying-pair count lands within ~1.4x of
  *    the identity's (30k-59k vs 43k, re-vettable with the DuckDB
  *    sweep in SCALE.md's r14 notes) — the point of the synthesis is
  *    geometry preservation, and a replica that octuples the candidate
  *    load has failed it.
  *  - embeddings: a per-replica cyclic shift of the vector components
  *    with a sign flip on the wrap (an orthogonal transform — norms
  *    and intra-replica dot products exact; cross-replica cosines
  *    decorrelate).
  *
  * Remaining tables are hard-copied unchanged (the measured queries
  * only read documents/embeddings; the copies keep Bench's warmup and
  * any table-listing census working).
  *
  * Usage: `runMain graft.ScaleSynth <srcDir> <dstDir> [factor] [mode]`
  * mode `all` (default) scales every table; mode `rel` scales ONLY the
  * relational tables (documents/embeddings are copied unchanged) — key
  * offsets compose at ANY factor, unlike the text rotations whose
  * vetted pool caps the documents factor at 10, so `rel` is how the
  * second scaling decade (~sf10) is synthesized for the TPC-H
  * families.
  */
object ScaleSynth {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val dstDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val relOnly = args.length > 3 && args(3) == "rel"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val ALPHA = alpha.toUpperCase
    def rot(s: String, r: Int) = s.drop(r % 26) + s.take(r % 26)
    // vetted rotation per replica index (see scaladoc): pair-count
    // preserving within ~1.4x; extend the vetting sweep before raising
    // factor past 10
    val vettedRot = Seq(0, 1, 3, 9, 15, 18, 20, 21, 24, 25)
    require(relOnly || factor <= vettedRot.size,
      s"only ${vettedRot.size} vetted rotations — re-vet before factor=$factor")
    // offset divisible by lcm(5,10,15)=30 keeps doc_id % k residues
    val idOffset = 30L * 1000 * 1000

    if (relOnly) {
      spark.read.parquet(s"$srcDir/documents.parquet")
        .write.mode("overwrite").parquet(s"$dstDir/documents.parquet")
      spark.read.parquet(s"$srcDir/embeddings.parquet")
        .write.mode("overwrite").parquet(s"$dstDir/embeddings.parquet")
    } else {
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      (0 until factor).map { ri =>
        val r = vettedRot(ri)
        docs.select(
          (col("doc_id") + lit(ri * idOffset)).as("doc_id"),
          translate(col("text"), alpha + ALPHA, rot(alpha, r) + rot(ALPHA, r))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dstDir/documents.parquet")

      val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
      (0 until factor).map { r =>
        // cyclic shift by r with sign-flipped wrap: orthogonal, so
        // intra-replica geometry is exact
        val shifted =
          if (r == 0) col("embedding")
          else concat(
            slice(col("embedding"), r + 1, 100000),
            transform(slice(col("embedding"), 1, r), x => -x))
        emb.select((col("vec_id") + lit(r * idOffset)).as("vec_id"),
          shifted.as("embedding"), col("label"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dstDir/embeddings.parquet")
    }

    // Relational tables scale by KEY-OFFSET replication: every key
    // column of a replica shifts by the same offset, so each replica
    // is a join-closed copy — join fan-outs, group-by-key
    // cardinalities, and date distributions are preserved exactly
    // (region/nation stay shared dims: their keys are left alone and
    // the fact-side nationkey/regionkey columns pass through, so dim
    // joins fan out 10x the way a real 10x corpus would). This is
    // what lets the TPC-H plan families be measured at ~sf1 with the
    // same per-replica geometry the sf0.1 oracles pinned. user_id in
    // events offsets too (sessionization windows stay replica-local).
    val keyCols: Map[String, Seq[String]] = Map(
      "orders.parquet" -> Seq("o_orderkey", "o_custkey"),
      "lineitem.parquet" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "customer.parquet" -> Seq("c_custkey"),
      "supplier.parquet" -> Seq("s_suppkey"),
      "part.parquet" -> Seq("p_partkey"),
      "events.parquet" -> Seq("event_id", "user_id"))
    keyCols.foreach { case (name, keys) =>
      val t = spark.read.parquet(s"$srcDir/$name")
      (0 until factor).map { ri =>
        t.select(t.columns.map { c =>
          if (keys.contains(c)) (col(c) + lit(ri * idOffset)).as(c)
          else col(c)
        }: _*)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dstDir/$name")
    }

    // hard-copy the shared dims (and anything else) unchanged
    val names = new java.io.File(srcDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
      .filterNot(n => n == "documents.parquet" || n == "embeddings.parquet")
      .filterNot(keyCols.contains)
    names.foreach { n =>
      spark.read.parquet(s"$srcDir/$n")
        .write.mode("overwrite").parquet(s"$dstDir/$n")
    }
    println(s"synthesized ${factor}x of $srcDir at $dstDir")
    spark.stop()
  }
}
