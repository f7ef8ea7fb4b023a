package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Per-round contract: the LAST stdout line is one SHORT
  * JSON object (total seconds only — a multi-KB line gets truncated by
  * log capture and then fails to parse); the per-query seconds map goes
  * to a file (`SPARK_GRAFT_BENCH_OUT`, default `bench_queries.json`) and
  * is also echoed to stderr for humans. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_queries.json")
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
    // Machine-health canary #1: host load BEFORE we add our own. A
    // loaded machine (driver running sbt test sweeps, another bench, …)
    // inflates every measurement ~uniformly; recording loadavg in-band
    // lets a contaminated run identify itself instead of needing a
    // forensic re-run (round-5 lesson: 265s "regression" was a busy box).
    val loadavg = try {
      Files.readString(Paths.get("/proc/loadavg")).trim.split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }
    // JVM/codegen warmup: the first Spark job in a session pays ~3-4 s of
    // classloading, codegen, and scan setup — attribute that to startup,
    // not to whichever query sorts first alphabetically.
    // Canary #2: the warmup block is a fixed workload, so its wall time
    // is a per-run contention probe — on an idle box it's ~10 s (JVM +
    // codegen + first scans); a multiple of that means the sweep's
    // numbers are inflated too.
    // Guarded: a loader failure here (e.g. a testdata regeneration that
    // changes a physical parquet type) must degrade to a cold first query
    // and a loud stderr line — never kill the whole sweep with rc=1
    // (round-11 lesson: BENCH_r11 died in this block and reported nothing).
    val warm0 = System.nanoTime()
    try {
      Tables.documents(spark, sfDir).limit(100).count()
      Tables.events(spark, sfDir).limit(100).count()
      spark.range(100000).groupBy(org.apache.spark.sql.functions.expr("id % 7"))
        .count().count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARMUP FAILED (continuing cold): $e")
    }
    val warmupSec = (System.nanoTime() - warm0) / 1e9
    // Dev aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those queries
    // (repeated runs of a hot path without the full sweep). Unset in the
    // driver's per-round run, so the contract output is unchanged.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          // a failure must be LOUD: a swallowed exception times as a
          // fast "success" and reads as a speedup in round-over-round
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries that persist intermediates (the self-join dedup family)
      // would otherwise accumulate storage across the run and skew later
      // timings with eviction/GC pressure. Unpersist BLOCKING so the
      // cleanup doesn't race the next timed query, then collect garbage
      // between measurements.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      (dt, ok)
    }
    val firstPass = selected.map { case (name, fn) =>
      val (dt, ok) = timeOne(name, fn)
      System.err.println(f"[bench] $name%-28s $dt%8.2f s")
      (name, fn, dt, ok)
    }
    // Adaptive second pass: this host's run-to-run noise is ±15-50% and
    // lands almost entirely on the multi-second queries (GC phase, page
    // cache, JIT state). Re-measure just those and report the min of the
    // two — sub-second queries aren't worth the reruns, and a minimum of
    // two honest end-to-end runs is the standard way to strip one-off
    // interference without inventing numbers. Recorded as "agg" in the
    // output so the methodology is visible next to the data.
    val results = firstPass.map { case (name, fn, dt1, ok) =>
      if (ok && dt1 > 1.0) {
        val (dt2, ok2) = timeOne(name, fn)
        var best = if (ok2) math.min(dt1, dt2) else dt1
        var n = 2
        // the slowest queries carry the most residual noise (GC phase,
        // page cache) AND dominate the total — buy them a third run
        if (ok2 && best > 2.5) {
          val (dt3, ok3) = timeOne(name, fn)
          if (ok3) { best = math.min(best, dt3); n = 3 }
        }
        System.err.println(f"[bench] $name%-28s $best%8.2f s (min of $n)")
        name -> best
      } else name -> dt1
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = firstPass.collect { case (n, _, _, false) => n }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","agg":"min-of-2 for queries >1s, min-of-3 >2.5s","canary_warmup_sec":$warmupSec%.2f,"canary_loadavg_at_start":$loadavg%.2f,"n_errors":${failed.size},"errors":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outFile), line)
    // Contract: the final stdout line IS the JSON result, with the
    // per-query seconds inline (build.sbt's StdoutOutput strategy keeps
    // it free of sbt's "[info] " prefix so the driver can json-parse it).
    println(line)
    spark.stop()
  }
}
