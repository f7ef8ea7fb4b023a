package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: key correctness against a direct bit-interleave, and
  * the actual data-skipping property — per-file min/max spreads stay
  * tight on BOTH clustered dimensions, where a 1-D sort leaves the
  * non-leading column unbounded (so no filter on it can prune files). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey matches a direct reference bit-interleave") {
    def ref(x: Long, y: Long): Long = (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L), (255L, 256L))
    val got = cases.toDF("x", "y")
      .select($"x", $"y", Layout.zorderKey($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // the curve is a bijection on the 16-bit plane: distinct inputs,
    // distinct keys
    assert(got.map(_.getLong(2)).distinct.length == cases.length)
  }

  test("bucketed signature store: a join between two tables bucketed by " +
    "the band key plans ZERO exchanges — the band shuffle is paid once " +
    "at write time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val store = (0 until 200)
      .map(i => (i.toLong, i % 4, s"band_${i % 37}"))
      .toDF("doc_id", "band_id", "band_key")
    val batch = (0 until 50)
      .map(i => (10000L + i, i % 4, s"band_${i % 37}"))
      .toDF("doc_id", "band_id", "band_key")
    Layout.bucketedStoreWrite(store, "sig_store", s"$tmp/sig_store", 8,
      Seq("band_key"))
    Layout.bucketedStoreWrite(batch, "sig_batch", s"$tmp/sig_batch", 8,
      Seq("band_key"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeBc =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("sig_store")
        .join(spark.table("sig_batch"), Seq("band_key"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "broadcast must be off so the assertion is about bucketing")
      assert(!p.contains("Exchange"),
        s"bucket-aligned join must not shuffle either side:\n$p")
      // and it actually runs: 50 batch rows each hit their band block
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      prevAqeBc match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS sig_store")
      spark.sql("DROP TABLE IF EXISTS sig_batch")
    }
  }

  test("z-ordered files bound min/max spread on BOTH dimensions; a 1-D " +
    "sort leaves the second dimension unprunable") {
    val n = 64
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val zdir = "/tmp/graft-test-zorder"
    val ldir = "/tmp/graft-test-linear"
    Layout.zorderWrite(grid, col("x"), col("y"), zdir, files = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)
    def avgSpread(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("s"))
        .agg(avg("s")).head.getDouble(0)
    // 4096 cells / 16 files = 256-cell z-range segments ≈ 16×16 blocks
    // (a straddling segment at worst doubles the box)
    assert(avgSpread(zdir, "x") < 32, "z-order x spread")
    assert(avgSpread(zdir, "y") < 32, "z-order y spread")
    // x-sorted layout: x prunes perfectly but y spans the full domain in
    // every file — a y-filter reads everything
    assert(avgSpread(ldir, "y") > 48, "1-D layout leaves y unbounded")
  }

  test("compact rewrites a small-file directory to size-targeted files, " +
    "row-preserving") {
    val frag = "/tmp/graft-test-fragmented"
    val comp = "/tmp/graft-test-compacted"
    spark.range(10000).select(col("id"), (col("id") * 7 % 100).as("v"))
      .repartition(64) // the incremental-append long tail: 64 tiny files
      .write.mode("overwrite").parquet(frag)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) == 64)
    val totalBytes = new java.io.File(frag).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Layout.compact(spark, frag, comp, targetBytes = totalBytes / 4)
    assert(parquetFiles(comp) == n && n >= 2 && n <= 8,
      s"expected a handful of size-targeted files, got $n")
    // row-identical content
    assert(spark.read.parquet(comp).orderBy("id").collect().toSeq ==
      spark.read.parquet(frag).orderBy("id").collect().toSeq)
  }
}
