package graft

import org.apache.spark.sql.SparkSession

/** Layout-probe utility (r22, verdict item 5): rewrite every parquet
  * table of a testdata dir with a fixed file count, so the scaling
  * block's 8-vs-32-core comparison can be run against the SAME data in
  * single-split and multi-split layouts. The driver's sf0.1 testdata
  * ships each table as ONE file with ONE row group, which caps every
  * scan pipeline at one task regardless of core count — the r21
  * verdict's biggest remaining blind spot for the 100 TB claim
  * (operators that would parallelize on a real multi-split corpus
  * measure as core-count-invariant). Never part of the driver
  * contract; measurement methodology lives in [[Bench]].
  *
  * Usage: sbt "runMain graft.SplitRewrite <srcDir> <dstDir> <nFiles>"
  * (nFiles = 1 reproduces the shipped single-split layout from a
  * multi-file source, so both probe halves derive from one corpus).
  */
object SplitRewrite {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: SplitRewrite <srcDir> <dstDir> <nFiles>")
    val Array(src, dst, nStr) = args
    val n = nStr.toInt
    require(n >= 1, s"nFiles >= 1, got $n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Option(new java.io.File(src).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    require(tables.nonEmpty, s"no *.parquet tables under $src")
    tables.sortBy(_.getName).foreach { t =>
      val df = spark.read.parquet(t.getAbsolutePath)
      // repartition (not coalesce) for n > 1: the sources are few-file,
      // so coalesce could not widen; a round-robin repartition spreads
      // rows evenly across the n output files. n = 1 coalesces to keep
      // the single-split half shuffle-free and row-order-stable.
      val out = if (n == 1) df.coalesce(1) else df.repartition(n)
      out.write.mode("overwrite").parquet(s"$dst/${t.getName}")
      System.err.println(s"[splitrewrite] ${t.getName} -> $n file(s)")
    }
    spark.stop()
  }
}
