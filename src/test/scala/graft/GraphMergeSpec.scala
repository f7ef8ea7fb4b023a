package graft

import graft.operators.{DedupGate, GraphMerge, MinHashPipeline}
import org.apache.spark.sql.functions._

/** Scenario fixtures for the SCD-2 merge and the 3-way dedup gate
  * (FIXTURES.md §1 golden scenarios; SURVEY §2.10 ST3–ST7). */
class GraphMergeSpec extends SparkSpec {
  import spark.implicits._

  private val payload = Seq("text", "lang")

  private def current = Seq(
    ("d1", "original text one", "en", 1L, "published"),
    ("d2", "original text two", "en", 1L, "published"),
    ("d3", "historic", "en", 1L, "archive"),
    ("d4", "untouched", "en", 2L, "published"))
    .toDF("uid", "text", "lang", "version", "status")

  test("ST6 insert-if-absent: unseen uid arrives as version 1") {
    val incoming = Seq(("d9", "brand new", "fr", 1.0))
      .toDF("uid", "text", "lang", "sim")
    val out = GraphMerge.merge(current, incoming, payload)
    val d9 = out.filter($"uid" === "d9").collect()
    assert(d9.length == 1)
    assert(d9.head.getAs[Long]("version") == 1L)
    assert(d9.head.getAs[String]("status") == "published")
    assert(out.count() == 5)
  }

  test("ST4 version fork: big change archives old row, inserts version+1") {
    val incoming = Seq(("d1", "totally rewritten", "en", 0.5))
      .toDF("uid", "text", "lang", "sim")
    val out = GraphMerge.merge(current, incoming, payload)
    val d1 = out.filter($"uid" === "d1").orderBy("version").collect()
    assert(d1.length == 2)
    assert(d1(0).getAs[Long]("version") == 1L)
    assert(d1(0).getAs[String]("status") == "archive")
    assert(d1(0).getAs[String]("text") == "original text one")
    assert(d1(1).getAs[Long]("version") == 2L)
    assert(d1(1).getAs[String]("status") == "published")
    assert(d1(1).getAs[String]("text") == "totally rewritten")
  }

  test("ST5 in-place merge on small change: version kept, payload updated") {
    val incoming = Seq(("d2", "original text two (typo fix)", "en", 0.999))
      .toDF("uid", "text", "lang", "sim")
    val out = GraphMerge.merge(current, incoming, payload)
    val d2 = out.filter($"uid" === "d2").collect()
    assert(d2.length == 1)
    assert(d2.head.getAs[Long]("version") == 1L)
    assert(d2.head.getAs[String]("text").contains("typo fix"))
  }

  test("archived history and untouched rows pass through unchanged") {
    val incoming = Seq(("d1", "x", "en", 0.5)).toDF("uid", "text", "lang", "sim")
    val out = GraphMerge.merge(current, incoming, payload)
    assert(out.filter($"uid" === "d3" && $"status" === "archive").count() == 1)
    assert(out.filter($"uid" === "d4" && $"version" === 2L &&
      $"status" === "published").count() == 1)
  }

  test("matched row with null sim forks instead of vanishing") {
    // Regression: `null < t` and `null >= t` are both null, which used to
    // drop the row from BOTH the fork and update branches while the
    // left_anti still excluded the uid — silently losing the live row.
    val incoming = Seq(("d1", "resubmitted, similarity unknown", "en",
      null.asInstanceOf[java.lang.Double]))
      .toDF("uid", "text", "lang", "sim")
    val out = GraphMerge.merge(current, incoming, payload)
    val d1 = out.filter($"uid" === "d1").orderBy("version").collect()
    assert(d1.length == 2)
    assert(d1(0).getAs[String]("status") == "archive")
    assert(d1(1).getAs[Long]("version") == 2L)
    assert(d1(1).getAs[String]("status") == "published")
    assert(d1(1).getAs[String]("text") == "resubmitted, similarity unknown")
  }

  test("two incoming rows for ONE uid in a batch collapse before the " +
    "merge: one live row per uid survives, lowest sim wins (r20 review)") {
    // The gate's coalesce(matched_node_id, uid) routing can map two
    // batch docs onto the same store node in one micro-batch; without a
    // pre-collapse both match the same live row and the winning branch
    // emits TWO live rows with the same version, fanning out every
    // later merge. Policy: lowest sim survives (unknown ⇒ most changed,
    // the same lossless bias as the null-sim fork), payload order
    // breaks ties deterministically.
    val incoming = Seq(
      ("d1", "near identical rewrite", "en", 0.999),
      ("d1", "radical rewrite", "en", 0.4))
      .toDF("uid", "text", "lang", "sim")
    val out = GraphMerge.merge(current, incoming, payload)
    val live = out.filter($"uid" === "d1" && $"status" =!= "archive")
      .collect()
    assert(live.length == 1, s"one live row per uid, got ${live.length}")
    assert(live.head.getAs[String]("text") == "radical rewrite" &&
      live.head.getAs[Long]("version") == 2L,
      "the lowest-sim row must win the batch slot (and fork)")
    assert(out.filter($"uid" === "d1" && $"status" === "archive")
      .count() == 1, "the superseded live row archives exactly once")
  }

  test("a store row with NULL status survives the rewrite as live " +
    "(r20 review: it used to vanish from both partitions)") {
    val cur = current.unionByName(
      Seq(("d7", "status unknown", "en", 3L,
        null.asInstanceOf[String]))
        .toDF("uid", "text", "lang", "version", "status"))
    val incoming = Seq(("d9", "unrelated", "fr", 1.0))
      .toDF("uid", "text", "lang", "sim")
    val out = GraphMerge.merge(cur, incoming, payload)
    val d7 = out.filter($"uid" === "d7").collect()
    assert(d7.length == 1, "null-status row must not be dropped")
    assert(d7.head.getAs[Long]("version") == 3L)
  }

  test("replay idempotence: merging the same near-identical batch twice " +
    "changes nothing the second time") {
    val incoming = Seq(("d2", "patched", "en", 0.999)).toDF("uid", "text", "lang", "sim")
    val once = GraphMerge.merge(current, incoming, payload)
    val twice = GraphMerge.merge(once, incoming, payload)
    assert(once.orderBy("uid", "version").collect().toSeq ==
      twice.orderBy("uid", "version").collect().toSeq)
  }

  test("dedup gate: identical→duplicate, changed-meta→version, new→new, " +
    "within-batch twin→duplicate") {
    val corpusDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again", "en", "published"),
      (11L, "some other stored document about regulations and safety", "en", "published"))
      .toDF("node_id", "text", "meta_key", "status")
    val corpus = corpusDocs.join(
      MinHashPipeline.signatures(corpusDocs, "node_id", $"text"), "node_id")

    val incDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),  // dup of 10
      (2L, "the quick brown fox jumps over the lazy dog again and again", "xx"),  // meta differs → version
      (3L, "completely novel content never seen before in any store", "en"),      // new
      (4L, "completely novel content never seen before in any store", "en"))      // twin of 3 → duplicate
      .toDF("uid", "itext", "meta_key")
    val incoming = incDocs.join(
      MinHashPipeline.signatures(incDocs, "uid", $"itext"), "uid")

    val out = DedupGate.classify(incoming, corpus, 4, 4)
      .select("uid", "outcome").as[(Long, String)].collect().toMap
    assert(out(1L) == "duplicate")
    assert(out(2L) == "version")
    assert(out(3L) == "new")
    assert(out(4L) == "duplicate")
  }
}
