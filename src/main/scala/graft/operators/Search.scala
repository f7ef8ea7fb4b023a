package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The search API's query planner — SURVEY.md §2.3 P1/P2, §2.7 O1–O3,
  * §3.2: reference `lambdas/typedb_search_query/search_functions.py:9-65`
  * (query_builder) + `handler.py:47-88` (search_module).
  *
  * The reference builds a TQL string and post-processes in pandas; here a
  * request compiles directly to a Catalyst plan, so pushdown/pruning
  * replace the reference's hand-rolled "late materialization" (fetch page
  * keys, then full rows — `search_functions.py:90-123`).
  */
object Search {

  /** The ONE date-only shape both the boundary's calendar guard and
    * predicate()'s plan-time parse key on (r20 review: two hand-copied
    * regexes could drift — a request passing the 400 guard under one
    * copy but parsed under a wider other copy would throw
    * DateTimeParseException at plan time, escaping the lambda's 400
    * contract). */
  private val DateOnly = """\d{4}-\d{2}-\d{2}""".r

  /** A search request — mirror of the reference's lambda event params
    * (`handler.py:16-20,49-59`). All filters conjunctive. */
  case class Request(
    idEquals: Option[String] = None,               // by-id plan shape
    topicEquals: Option[String] = None,            // equality
    keywordAnd: Seq[String] = Nil,                 // AND-list, substring
    typeIn: Seq[String] = Nil,                     // OR-list
    statusIn: Seq[String] = Nil,                   // OR-list
    regulatorIn: Seq[String] = Nil,                // OR-list (search_functions.py:33-38)
    excludeStatus: Option[String] = Some("archive"), // negation
    dateFrom: Option[String] = None,               // inclusive range
    dateTo: Option[String] = None,
    titleContains: Option[String] = None,
    legislationHrefIn: Seq[String] = Nil,          // by-legislation plan shape (:21-27)
    orderAscending: Boolean = false,
    page: Int = 0,
    pageSize: Int = 10,                            // handler.py:20
    hardCap: Int = 10000,                          // search_functions.py:64
    legCap: Int = 1000)                            // search_functions.py:26 `limit 1000`

  /** Column bindings: which physical columns play uid/topic/keywords/…
    * so the planner works over any conforming DataFrame. `regulator` has
    * a conventional default because most conforming frames carry the
    * reference's own column name; it is only dereferenced when the
    * request sets `regulatorIn`. */
  case class Binding(
    uid: String, topic: String, text: String, docType: String,
    status: String, title: String, date: String,
    regulator: String = "regulator_id")

  /** Bindings for the by-legislation plan shape: the legislation table's
    * URI column and the publication edge's two endpoint columns
    * (`search_functions.py:21-27` — `(issuedFor:$x, issued:$regdoc) isa
    * publication`). */
  case class LegBinding(legUri: String, edgeLeg: String, edgeDoc: String)

  /** P6 — the key set a request is recognized by (`handler.py:16-18`).
    * Pagination/order params deliberately do NOT count: a request with
    * only `page`/`order` is a 400 in the reference too. */
  val SearchKeys: Set[String] = Set("id", "keyword", "title",
    "date_published", "regulator_id", "status", "regulatory_topic",
    "document_type", "legislation_href")

  /** The reference's 400 payload (`handler.py:53-57`). */
  case class BadRequest(statusCode: Int, statusDescription: String)
  val Unsupported: BadRequest =
    BadRequest(400, "Bad Request - Unsupported search parameter(s).")
  val MalformedPagination: BadRequest =
    BadRequest(400, "Bad Request - Malformed pagination parameter(s).")
  val MalformedDate: BadRequest =
    BadRequest(400, "Bad Request - Malformed date_published parameter.")

  /** P6 key-set validation (`handler.py:49-59`): a request qualifies iff
    * its key set intersects [[SearchKeys]]. Unknown keys are ignored —
    * the reference intersects, it does not reject on extras. */
  def validate(event: Map[String, String]): Either[BadRequest, Map[String, String]] =
    if ((event.keySet & SearchKeys).isEmpty) Left(Unsupported) else Right(event)

  /** Untyped event dict → typed [[Request]] (the lambda boundary).
    * Conventions for the flat string map: OR-lists (`document_type`,
    * `status`, `regulator_id`, `legislation_href`) are comma-separated;
    * `keyword` splits on spaces into an AND-list
    * (`search_functions.py:40-42`); `date_published` is `start..end`
    * with either side empty (`:49-56`) — a bare date (no `..`) means
    * that exact day (start = end), NEVER a silent no-filter.
    *
    * Malformed `page`/`page_size` (non-numeric, negative) is a 400, not
    * an exception and not a silent default — the same no-silent-no-op
    * contract the filter keys carry. */
  def fromEvent(event: Map[String, String]): Either[BadRequest, Request] =
    validate(event).flatMap { ev =>
      // Calendar validation at the boundary: a regex-valid but
      // calendar-invalid day ('2024-02-30', '2024-13-01') must be a 400
      // here — predicate() parses date-only bounds to compile the
      // end-of-day-exclusive form, and an uncaught DateTimeParseException
      // there would escape the lambda's 400 contract entirely.
      def calendarValid(side: Option[String]): Boolean = side.forall { v =>
        !DateOnly.matches(v) ||
          scala.util.Try(java.time.LocalDate.parse(v)).isSuccess
      }
      val dates: Either[BadRequest, (Option[String], Option[String])] =
        (ev.get("date_published") match {
          case Some(r) if r.contains("..") => r.split("\\.\\.", -1) match {
            case Array(a, b) => Right((Option(a).filter(_.nonEmpty),
              Option(b).filter(_.nonEmpty)))
            // '2024..2025..2026' — dropping the filter here would be the
            // silent no-op this boundary forbids; same contract as
            // malformed pagination
            case _ => Left(MalformedDate)
          }
          // bare date: exact-day filter, not a dropped filter
          case Some(r) => Right((Some(r).filter(_.nonEmpty),
            Some(r).filter(_.nonEmpty)))
          case None => Right((None, None))
        }).filterOrElse(
          ft => calendarValid(ft._1) && calendarValid(ft._2), MalformedDate)
      def nonNegInt(key: String, default: Int): Either[BadRequest, Int] =
        ev.get(key) match {
          case None => Right(default)
          case Some(v) => v.toIntOption.filter(_ >= 0)
            .toRight(MalformedPagination)
        }
      for {
        fromTo <- dates
        (from, to) = fromTo
        page <- nonNegInt("page", 0)
        pageSize <- nonNegInt("page_size", 10)
      } yield Request(
        idEquals = ev.get("id"),
        topicEquals = ev.get("regulatory_topic"),
        keywordAnd = ev.get("keyword").toSeq
          .flatMap(_.split(" ")).filter(_.nonEmpty),
        typeIn = ev.get("document_type").toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty),
        statusIn = ev.get("status").toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty),
        regulatorIn = ev.get("regulator_id").toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty),
        dateFrom = from,
        dateTo = to,
        titleContains = ev.get("title"),
        legislationHrefIn = ev.get("legislation_href").toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty),
        orderAscending = ev.get("order").contains("asc"),
        page = page,
        pageSize = pageSize)
    }

  /** The reference routes `legislation_href` requests to a different plan
    * shape (related-docs API, `search_functions.py:21-27`) — callers pick
    * [[planByLegislation]] when this is true, [[plan]] otherwise. */
  def isByLegislation(r: Request): Boolean = r.legislationHrefIn.nonEmpty

  /** Compile the conjunctive predicate (P1). Every branch is a
    * pushdown-friendly `Column` expression — no UDFs, no string plans. */
  def predicate(r: Request, b: Binding): Column = {
    val always = lit(true)
    Seq(
      r.idEquals.map(col(b.uid) === _),
      r.topicEquals.map(col(b.topic) === _),
      Option.when(r.keywordAnd.nonEmpty)(
        r.keywordAnd.map(k => col(b.text).contains(k)).reduce(_ && _)),
      Option.when(r.typeIn.nonEmpty)(col(b.docType).isin(r.typeIn: _*)),
      Option.when(r.statusIn.nonEmpty)(col(b.status).isin(r.statusIn: _*)),
      // regulator_id OR-list (search_functions.py:33-38 `like "a|b|c"`)
      Option.when(r.regulatorIn.nonEmpty)(
        col(b.regulator).isin(r.regulatorIn: _*)),
      r.excludeStatus.map(col(b.status) =!= _),
      r.dateFrom.map(col(b.date) >= _),
      // A day-granular upper bound means END of that day: compile it as
      // an exclusive next-day bound, which is correct under string
      // comparison for both date-only ('2024-02-01') and timestamp
      // ('2024-02-01 14:30:00') bindings — a plain <= would match only
      // exact-midnight rows in the timestamp case (both the bare-date
      // and '..end' range forms hit this).
      r.dateTo.map { t =>
        if (DateOnly.matches(t)) {
          val next = java.time.LocalDate.parse(t).plusDays(1)
          // r20 review: 9999-12-31 is the regex's last expressible day,
          // and its next-day exclusive bound renders as "+10000-01-01" —
          // a 5-digit year breaks the string comparison entirely (the
          // leading '+' sorts below every digit, silently emptying the
          // result set). The last day has nothing after it to exclude,
          // so an INCLUSIVE bound is exact: "<= the bare date" keeps
          // every earlier day and the date-only form of the day itself,
          // and startsWith keeps that day's timestamp rows (whose time
          // suffix makes them compare above the bare date string).
          if (next.getYear > 9999)
            col(b.date) <= lit(t) || col(b.date).startsWith(t)
          else col(b.date) < next.toString
        } else col(b.date) <= t
      },
      // Locale.ROOT (r20 review): the column side lowercases with
      // Spark's locale-independent lower(); a default-locale
      // String.toLowerCase diverges under the Turkish-family locales
      // ('I' → dotless ı) and silently excludes matching titles.
      r.titleContains.map(t => lower(col(b.title))
        .contains(t.toLowerCase(java.util.Locale.ROOT)))
    ).flatten.foldLeft(always)(_ && _)
  }

  /** Full plan: filter → order+limit truncation → deterministic window
    * pagination (O1/O2/O3; `search_functions.py:98,118-123`).
    *
    * Scale shape: `rn ≤ page_end ≤ hardCap`, so the plan first truncates
    * with `orderBy(keys).limit(page_end)` — Spark executes that as
    * TakeOrderedAndProject (per-partition top-k, then ONE merge of only
    * `page_end` rows) — and only then ranks the ≤page_end survivors with
    * the window. The naive global `Window.orderBy` (no partitionBy) would
    * funnel every row surviving the filters through a single task; here
    * the single-task stage sees at most `hardCap` (10k) rows regardless
    * of corpus size — the same bound the reference pages over
    * (`search_functions.py:64,118-123`). */
  def plan(df: DataFrame, r: Request, b: Binding): DataFrame = {
    val keys =
      if (r.orderAscending) Seq(col(b.date).asc, col(b.uid).asc)
      else Seq(col(b.date).desc, col(b.uid).desc)
    // r20 review: LONG page arithmetic — page and pageSize each pass the
    // boundary's non-negative Int guard, but their PRODUCT can overflow
    // Int (page=214748364 × pageSize=10), turning hi negative and
    // throwing AnalysisException out of limit() instead of returning the
    // empty page the hard cap implies. The cap is 10k, so clamping the
    // Long product back into Int is exact.
    val lo = math.min(r.page.toLong * r.pageSize + 1, r.hardCap + 1L).toInt
    val hi = math.min((r.page.toLong + 1) * r.pageSize, r.hardCap.toLong).toInt
    df.filter(predicate(r, b))
      .orderBy(keys: _*).limit(hi)
      .withColumn("rn", row_number().over(Window.orderBy(keys: _*)))
      .filter(col("rn").between(lo, hi))
  }

  /** The related-documents plan shape (`search_functions.py:21-27`):
    * legislation rows matching the href OR-list → publication edge →
    * live (non-archive) documents, `limit 1000` (legCap), then per-
    * legislation pages of `pageSize` newest docs (`search_reg_docs`'s
    * `regdocs[:page_size]`, `:69-87`).
    *
    * Scale shape: the href list is a literal IN-filter, so the matched
    * legislation side is tiny by construction — it is broadcast, and the
    * edge scan filters on the broadcast before the document join (the
    * docs side never shuffles for the legislation probe). The global
    * legCap truncation is `orderBy(...).limit(legCap)` ≙
    * TakeOrderedAndProject (per-partition top-k, one merge of ≤legCap
    * rows); the per-legislation window then ranks only those ≤legCap
    * survivors. Deterministic total order: (href, date, uid) — the
    * reference's bare TQL `limit 1000` is an arbitrary subset; we pin it.
    *
    * Output columns: `legislation_href`, the document frame's columns,
    * and `rn` (1-based rank within its legislation page). `lb.edgeLeg`/
    * `lb.edgeDoc` name the edge frame's endpoint columns; `b.uid`/
    * `b.status`/`b.date` are the only document bindings dereferenced. */
  def planByLegislation(legs: DataFrame, edges: DataFrame, docs: DataFrame,
      r: Request, b: Binding, lb: LegBinding): DataFrame = {
    require(r.legislationHrefIn.nonEmpty, "by-legislation plan needs hrefs")
    val wanted = legs
      .filter(col(lb.legUri).isin(r.legislationHrefIn: _*))
      .select(col(lb.legUri).as("legislation_href"))
    val live = docs.filter(
      r.excludeStatus.map(col(b.status) =!= _).getOrElse(lit(true)))
    val keys =
      if (r.orderAscending) Seq(col(b.date).asc, col(b.uid).asc)
      else Seq(col(b.date).desc, col(b.uid).desc)
    edges
      .join(broadcast(wanted), col(lb.edgeLeg) === col("legislation_href"))
      .join(live, col(lb.edgeDoc) === col(b.uid))
      .drop(lb.edgeLeg, lb.edgeDoc)
      .orderBy((col("legislation_href").asc +: keys): _*).limit(r.legCap)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("legislation_href")).orderBy(keys: _*)))
      .filter(col("rn") <= r.pageSize)
  }
}
