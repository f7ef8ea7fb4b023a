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

  private val br = b.copy(regulator = "reg")
  private def regDocs = Seq(
    ("a", "t1", "alpha", "GD", "published", "A", "2024-01-01", "HSE"),
    ("b", "t1", "beta", "GD", "published", "B", "2024-02-01", "EA"),
    ("c", "t1", "gamma", "GD", "published", "C", "2024-03-01", "HSE"),
    ("d", "t1", "delta", "GD", "published", "D", "2024-04-01", "OFCOM"))
    .toDF("uid", "topic", "text", "dt", "status", "title", "dt_pub", "reg")

  test("regulator_id OR-list filters (search_functions.py:33-38)") {
    val r = Search.Request(regulatorIn = Seq("HSE", "EA"),
      excludeStatus = None, pageSize = 10)
    val got = Search.plan(regDocs, r, br).select("uid").as[String].collect().toSet
    assert(got == Set("a", "b", "c")) // d excluded: wrong regulator
  }

  test("event regulator_id is parsed and actually filters (no silent no-op)") {
    val ev = Search.fromEvent(Map("regulator_id" -> "HSE")).toOption.get
    assert(ev.regulatorIn == Seq("HSE"))
    val got = Search.plan(regDocs, ev.copy(excludeStatus = None), br)
      .select("uid").as[String].collect().toSet
    // the old defect returned the unfiltered corpus {a,b,c,d} here
    assert(got == Set("a", "c"))
    // comma OR-list
    val ev2 = Search.fromEvent(Map("regulator_id" -> "HSE,OFCOM")).toOption.get
    assert(ev2.regulatorIn == Seq("HSE", "OFCOM"))
  }

  test("event legislation_href parses and routes to the by-leg plan shape") {
    val ev = Search.fromEvent(
      Map("legislation_href" -> "leg/1,leg/2")).toOption.get
    assert(ev.legislationHrefIn == Seq("leg/1", "leg/2"))
    assert(Search.isByLegislation(ev))
    assert(!Search.isByLegislation(Search.Request(idEquals = Some("x"))))
  }

  test("by-legislation plan: edge join, archive exclusion, per-leg page, legCap") {
    val legs = Seq("leg/1", "leg/2", "leg/3").toDF("leg_uri")
    val edges = Seq(
      ("leg/1", "d1"), ("leg/1", "d2"), ("leg/1", "d3"), ("leg/1", "d4"),
      ("leg/2", "d5"), ("leg/2", "d6"),
      ("leg/3", "d7"), ("leg/9", "d8")).toDF("pub_leg", "pub_doc")
    val docs = Seq(
      ("d1", "published", "2024-01-01"), ("d2", "published", "2024-02-01"),
      ("d3", "published", "2024-03-01"), ("d4", "published", "2024-04-01"),
      ("d5", "published", "2024-05-01"), ("d6", "archive", "2024-06-01"),
      ("d7", "published", "2024-07-01"), ("d8", "published", "2024-08-01"))
      .toDF("uid", "status", "dt_pub")
    val lb = Search.LegBinding("leg_uri", "pub_leg", "pub_doc")
    val bb = Search.Binding(uid = "uid", topic = "uid", text = "uid",
      docType = "uid", status = "status", title = "uid", date = "dt_pub")
    val r = Search.Request(legislationHrefIn = Seq("leg/1", "leg/2", "leg/3"),
      pageSize = 2, legCap = 1000)
    val got = Search.planByLegislation(legs, edges, docs, r, bb, lb)
      .select("legislation_href", "rn", "uid")
      .as[(String, Int, String)].collect().toSet
    // leg/1: newest 2 of 4 (page cap); leg/2: d6 archived → only d5;
    // leg/3: d7; d8's edge points at an unrequested leg → absent.
    assert(got == Set(("leg/1", 1, "d4"), ("leg/1", 2, "d3"),
      ("leg/2", 1, "d5"), ("leg/3", 1, "d7")))
    // legCap truncation is deterministic by (href asc, date desc, uid desc):
    // cap 3 keeps leg/1's 4 candidates minus the last, then nothing else.
    val capped = Search.planByLegislation(legs, edges, docs,
      r.copy(legCap = 3), bb, lb)
      .select("legislation_href", "rn", "uid")
      .as[(String, Int, String)].collect().toSet
    assert(capped == Set(("leg/1", 1, "d4"), ("leg/1", 2, "d3")))
  }

  test("malformed pagination is a 400, not an exception or silent default") {
    assert(Search.fromEvent(Map("keyword" -> "a", "page" -> "abc"))
      == Left(Search.MalformedPagination))
    assert(Search.fromEvent(Map("keyword" -> "a", "page_size" -> "-5"))
      == Left(Search.MalformedPagination))
    assert(Search.fromEvent(Map("keyword" -> "a", "page" -> "3"))
      .toOption.get.page == 3)
  }

  test("bare date_published filters to that exact day, never a silent no-op") {
    val ev = Search.fromEvent(Map("date_published" -> "2024-02-01")).toOption.get
    assert(ev.dateFrom.contains("2024-02-01") && ev.dateTo.contains("2024-02-01"))
    val got = Search.plan(docs, ev.copy(excludeStatus = None), b)
      .select("uid").as[String].collect().toSet
    assert(got == Set("b")) // only the doc published that day
    // range forms still work
    val r2 = Search.fromEvent(Map("date_published" -> "..2024-02-15")).toOption.get
    assert(r2.dateFrom.isEmpty && r2.dateTo.contains("2024-02-15"))
  }

  test("day-granular date bounds cover the WHOLE day under a timestamp " +
    "binding (exclusive next-day upper bound)") {
    // same shape orp_search_by_leg binds: 'yyyy-MM-dd HH:mm:ss' strings
    val tsDocs = Seq(
      ("a", "t", "x", "GD", "published", "A", "2024-01-31 23:59:59"),
      ("b", "t", "x", "GD", "published", "B", "2024-02-01 00:00:00"),
      ("c", "t", "x", "GD", "published", "C", "2024-02-01 14:30:00"),
      ("d", "t", "x", "GD", "published", "D", "2024-02-02 00:00:00"))
      .toDF("uid", "topic", "text", "dt", "status", "title", "dt_pub")
    // bare date: every row ON Feb 1, not just exact-midnight ones
    val bare = Search.fromEvent(Map("date_published" -> "2024-02-01"))
      .toOption.get.copy(excludeStatus = None)
    assert(Search.plan(tsDocs, bare, b)
      .select("uid").as[String].collect().toSet == Set("b", "c"))
    // '..end' range: the end day is inclusive through its last second
    val upTo = Search.fromEvent(Map("date_published" -> "..2024-02-01"))
      .toOption.get.copy(excludeStatus = None)
    assert(Search.plan(tsDocs, upTo, b)
      .select("uid").as[String].collect().toSet == Set("a", "b", "c"))
    // a timestamp-granular upper bound keeps plain inclusive <=
    val tsTo = Search.Request(excludeStatus = None,
      dateTo = Some("2024-02-01 00:00:00"), pageSize = 10)
    assert(Search.plan(tsDocs, tsTo, b)
      .select("uid").as[String].collect().toSet == Set("a", "b"))
  }

  test("dateTo at the last representable day (9999-12-31) keeps every " +
    "row instead of silently emptying the result set (r20 review)") {
    // the next-day exclusive bound of 9999-12-31 renders as
    // '+10000-01-01', whose leading '+' sorts below every digit — the
    // old compile turned 'until forever' into 'match nothing'
    val tsDocs = Seq(
      ("a", "t", "x", "GD", "published", "A", "2024-01-31 23:59:59"),
      ("b", "t", "x", "GD", "published", "B", "9999-12-31 23:59:59"),
      ("c", "t", "x", "GD", "published", "C", "9999-12-31"))
      .toDF("uid", "topic", "text", "dt", "status", "title", "dt_pub")
    val r = Search.fromEvent(Map("date_published" -> "..9999-12-31"))
      .toOption.get.copy(excludeStatus = None)
    assert(Search.plan(tsDocs, r, b)
      .select("uid").as[String].collect().toSet == Set("a", "b", "c"),
      "the max-date upper bound must keep all rows, incl. same-day " +
        "timestamps")
  }

  test("page arithmetic that overflows Int yields the empty page the " +
    "hard cap implies, not a negative-limit AnalysisException (r20)") {
    val r = Search.Request(excludeStatus = None,
      page = 214748364, pageSize = 10)
    assert(Search.plan(docs, r, b).count() == 0L,
      "a page beyond the hard cap is empty, never a plan-time throw")
  }

  test("multi-separator date_published is a 400, not a dropped filter") {
    assert(Search.fromEvent(Map("date_published" -> "2024..2025..2026"))
      == Left(Search.MalformedDate))
    // the open-both-sides range '..' stays a legal everything-range
    val open = Search.fromEvent(Map("date_published" -> "..")).toOption.get
    assert(open.dateFrom.isEmpty && open.dateTo.isEmpty)
  }

  test("calendar-invalid date_published is a 400, not a predicate-time " +
    "exception") {
    // regex-valid but calendar-invalid: before this guard these threw
    // DateTimeParseException inside predicate(), escaping the 400 contract
    for (bad <- Seq("2024-02-30..", "..2024-13-01", "2024-02-30",
        "2024-02-30..2024-13-01"))
      assert(Search.fromEvent(Map("date_published" -> bad))
        == Left(Search.MalformedDate), bad)
    // leap-day sanity both ways
    assert(Search.fromEvent(Map("date_published" -> "..2024-02-29")).isRight)
    assert(Search.fromEvent(Map("date_published" -> "..2023-02-29"))
      == Left(Search.MalformedDate))
    // timestamp-granular bounds never go through LocalDate.parse
    assert(Search.fromEvent(
      Map("date_published" -> "..2024-02-01 14:30:00")).isRight)
  }

  test("by-legislation plan honors ascending order") {
    val legs = Seq("leg/1").toDF("leg_uri")
    val edges = Seq(("leg/1", "d1"), ("leg/1", "d2"), ("leg/1", "d3"))
      .toDF("pub_leg", "pub_doc")
    val docs = Seq(
      ("d1", "published", "2024-01-01"), ("d2", "published", "2024-02-01"),
      ("d3", "published", "2024-03-01")).toDF("uid", "status", "dt_pub")
    val lb = Search.LegBinding("leg_uri", "pub_leg", "pub_doc")
    val bb = Search.Binding(uid = "uid", topic = "uid", text = "uid",
      docType = "uid", status = "status", title = "uid", date = "dt_pub")
    val r = Search.Request(legislationHrefIn = Seq("leg/1"),
      orderAscending = true, pageSize = 2)
    val got = Search.planByLegislation(legs, edges, docs, r, bb, lb)
      .orderBy("rn").select("uid").as[String].collect().toSeq
    assert(got == Seq("d1", "d2")) // oldest first under asc
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
