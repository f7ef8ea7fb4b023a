package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-capture utility for the optimization rounds: writes
  * `.explain("formatted")` of selected declared queries to files, so
  * plan claims in OPTIMIZATION_rN.md are checkable artifacts
  * (`plans/rN/<query>_{before,after}.txt`). Never part of the driver
  * contract; measurement methodology lives in [[Bench]].
  *
  * Usage:
  *   SPARK_GRAFT_PLAN_OUT=plans/r21 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.PlanDump q1,q2,..."   (or no args = all)
  *
  * The session mirrors Bench's config (same master/shuffle settings),
  * so the captured initial plan is the one the bench executes. AQE
  * means the FINAL plan can differ (coalesced reads, runtime joins);
  * for queries where that matters the bench artifact's exchange count
  * is the executed-structure record.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
