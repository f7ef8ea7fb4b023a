package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** Search planner unit + property tests (SURVEY §5.2: pagination =
  * sorted-slice; filters conjunctive). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val b = Search.Binding(uid = "uid", topic = "topic", text = "text",
    docType = "dt", status = "status", title = "title", date = "dt_pub")

  private def docs = Seq(
    ("a", "t1", "alpha beta", "GD", "published", "Alpha doc", "2024-01-01"),
    ("b", "t1", "beta gamma", "GD", "archive", "Beta doc", "2024-02-01"),
    ("c", "t2", "alpha gamma", "HS", "published", "Gamma doc", "2024-03-01"),
    ("d", "t1", "alpha beta gamma", "GD", "published", "Delta doc", "2024-04-01"))
    .toDF("uid", "topic", "text", "dt", "status", "title", "dt_pub")

  test("conjunctive predicate: topic + keyword AND-list + archive exclusion") {
    val r = Search.Request(topicEquals = Some("t1"),
      keywordAnd = Seq("alpha", "beta"), pageSize = 10)
    val got = Search.plan(docs, r, b).select("uid").as[String].collect().toSet
    assert(got == Set("a", "d")) // b excluded by archive, c by topic
  }

  test("OR-list, date range, title contains") {
    val r = Search.Request(typeIn = Seq("GD", "HS"),
      dateFrom = Some("2024-02-15"), titleContains = Some("doc"),
      excludeStatus = None, pageSize = 10)
    val got = Search.plan(docs, r, b).select("uid").as[String].collect().toSet
    assert(got == Set("c", "d"))
  }

  test("pagination equals sorted slice (property)") {
    val events = Tables.events(spark, sf)
      .select($"event_id".cast("string").as("uid"),
        lit("t").as("topic"), lit("x").as("text"), lit("GD").as("dt"),
        lit("published").as("status"), lit("T").as("title"),
        $"ts".cast("string").as("dt_pub"))
      .cache()
    val all = events.orderBy($"dt_pub".desc, $"uid".desc)
      .select("uid").as[String].collect()
    // pagination ≡ sorted-slice across a spread of (page, size) shapes
    // (including past-the-end pages)
    for ((page, size) <- Seq((0, 10), (1, 10), (3, 7), (0, 1), (5, 17),
      (199, 10), (0, 50))) {
      val r = Search.Request(excludeStatus = None, page = page,
        pageSize = size, hardCap = 10000)
      val got = Search.plan(events, r, b)
        .orderBy("rn").select("uid").as[String].collect()
      val want = all.slice(page * size, (page + 1) * size)
      assert(got.toSeq == want.toSeq, s"page=$page size=$size")
    }
  }

  test("hard cap bounds the page window") {
    val r = Search.Request(excludeStatus = None, page = 0, pageSize = 10,
      hardCap = 2)
    assert(Search.plan(docs, r, b).count() == 2)
  }

  test("P6: request with no recognized key is a 400") {
    assert(Search.validate(Map.empty) == Left(Search.Unsupported))
    // pagination/order params alone do not qualify (handler.py:49-59)
    assert(Search.fromEvent(Map("page" -> "2", "order" -> "asc"))
      == Left(Search.Unsupported))
    assert(Search.fromEvent(Map("frobnicate" -> "x"))
      == Left(Search.Unsupported))
  }

  test("P6: one recognized key qualifies; unknown extras are ignored") {
    val got = Search.fromEvent(Map(
      "keyword" -> "alpha beta", "status" -> "published,draft",
      "date_published" -> "2024-01-01..", "page" -> "1",
      "unknown_extra" -> "ignored"))
    assert(got.isRight)
    val r = got.toOption.get
    assert(r.keywordAnd == Seq("alpha", "beta"))
    assert(r.statusIn == Seq("published", "draft"))
    assert(r.dateFrom.contains("2024-01-01") && r.dateTo.isEmpty)
    assert(r.page == 1)
  }

  test("P6: event-built request plans identically to the typed request") {
    val ev = Search.fromEvent(Map("regulatory_topic" -> "t1",
      "keyword" -> "alpha beta")).toOption.get
    // Request's default archive exclusion stays on through fromEvent
    val got = Search.plan(docs, ev, b)
      .select("uid").as[String].collect().toSet
    assert(got == Set("a", "d"))
  }
}
