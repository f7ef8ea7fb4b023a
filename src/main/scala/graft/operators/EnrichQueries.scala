package graft.operators

import graft.Tables
import graft.functions.Texts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Enrichment-stage operators — SURVEY.md §2.9 M1–M6 re-expressed as
  * relational decompositions (the reference's torch/spaCy models are
  * replaced by their deterministic rule/gate logic, which IS in engine
  * scope — SURVEY §2.9 notes on M2/M5/M6), plus the remaining scalar
  * functions F10/F12/F14.
  *
  * Scale notes: every stage is either a narrow per-row expression or a
  * broadcast join against a small rule/dimension table followed by a
  * keyed aggregation — no cross joins, no driver-side loops.
  */
object EnrichQueries {
  type Q = (SparkSession, String) => DataFrame

  /** M5 rule table (rule_based_dti.py:27-67 EntityRuler phrase rules):
    * phrase → (label, priority); priority-max wins. */
  private val dtiRules: Seq[(String, String, Int)] = Seq(
    ("regulation", "MSI", 3), ("guidance", "GD", 2), ("safety", "HS", 2),
    ("spark", "GD", 1), ("filter", "HS", 1), ("join", "MSI", 1))

  val queries: Map[String, Q] = Map(
    // M1 summarisation, deterministic core (summarisation/utils.py:4-31):
    // 600-word smart shortener + complete-sentence trim to ~500 chars.
    // Scaled-down constants (20 words / 120 chars) fit the synthetic docs;
    // the reference constants live in the same expressions.
    "m1_summarise" -> ((s, d) => {
      val short = Texts.smartShorten(col("text"), 20)
      val prefix = short.substr(lit(1), lit(120))
      // smart_postprocessor: cut at the last '.' inside the window if one
      // exists, else keep the word-prefix (reference :18-31).
      val lastDot = length(prefix) - locate(".", reverse(prefix)) + 1
      val summary = when(locate(".", reverse(prefix)) > 0,
        prefix.substr(lit(1), lastDot)).otherwise(short)
      Tables.documents(s, d).select(col("doc_id"), summary.as("summary"))
    }),

    // M2 title-generation gate (title_generation.py:73-94): use the
    // metadata title iff score > threshold AND ≥3 tokens, else fall back
    // to generated candidate. Title candidate = first 6 words (W1 window
    // over the head of the text); score = overlap of candidate tokens
    // with the rest of the doc.
    "m2_title_gate" -> ((s, d) => {
      val toks = Texts.tokens(col("text"))
      val cand = slice(toks, 1, 6)
      // size(toks), not Int.MaxValue (r21, ADVICE): the oracle's toks[7:]
      // is unbounded and slice's length is only an upper bound, so
      // size(toks) ≥ the true tail length preserves full-tail semantics —
      // while Int.MaxValue overflowed in the INTERPRETED Slice eval path
      // (data.slice(start, start + length) wraps negative → empty tail),
      // silently zeroing the overlap on any runtime codegen fallback.
      val rest = slice(toks, lit(7), size(toks))
      val overlap = size(array_intersect(array_distinct(cand),
        array_distinct(rest)))
      val title = when(overlap >= 3 && size(cand) >= 3,
        array_join(cand, " ")).otherwise(lit("untitled"))
      Tables.documents(s, d)
        .select(col("doc_id"), overlap.as("score"), title.as("title"))
    }),

    // M3 keyword extraction, deterministic TF fallback
    // (keyword_extraction.py:74-101): stopword-filtered term frequency,
    // keep max per term, top-5 per doc (count desc, term asc).
    "m3_keywords" -> ((s, d) => {
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("word").asc)
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(Texts.filterStopwords(Texts.tokens(col("text")),
            Texts.StopWords)).as("word"))
        .groupBy("doc_id", "word").agg(count("*").as("tf"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
    }),

    // M4 language detection is ta_lang_id (TextQueries); M5 document-type
    // identification: broadcast phrase-rule join + priority argmax
    // (rule_based_dti.py:27-67). Truncation: first max(200, 10%) chars
    // (reference: max(2000, 10%)).
    "m5_doc_type" -> ((s, d) => {
      val rules = s.createDataFrame(dtiRules)
        .toDF("phrase", "label", "priority")
      // floor() on both sides: a bare cast truncates toward zero in Spark
      // while DuckDB's ::INT rounds-to-nearest — divergent for docs with
      // n_chars ≥ 2000 and fractional tenth ≥ .5.
      val head = col("text").substr(lit(1),
        greatest(lit(200), floor(col("n_chars") / 10).cast("int")))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("priority").desc, col("label").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), head.as("head"))
        .join(broadcast(rules), call_function("locate", col("phrase"), col("head")) > 0, "left")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"),
          coalesce(col("label"), lit("OTHER")).as("document_type"))
    }),

    // M6 legislative-origin extraction, fully relational
    // (legislative_origin_extraction.py:104-201): candidate titles from a
    // dimension table (part names ≙ legislation titles, keyed by a
    // derived year), filtered to years present in the doc (J4), exact
    // containment match (J5), first-sentence-hit wins (W4), dedup (T2).
    "m6_leg_origin" -> ((s, d) => {
      // Dimension: 'title' = first word of p_name, year derived from key.
      val dim = Tables.part(s, d).select(
        split(col("p_name"), " ").getItem(0).as("leg_title"),
        (col("p_partkey") % 5 + 2020).cast("int").as("year"))
        .filter(length(col("leg_title")) >= 4)
        .distinct()
      // Docs: derived "year mentions" from doc_id so J4 has a key to
      // prune on (synthetic docs have no literal years in the text).
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          array((col("doc_id") % 5 + 2020).cast("int"),
            (col("doc_id") % 3 + 2020).cast("int")).as("years"))
      val docYears = docs.select(col("doc_id"), col("text"),
        explode(array_distinct(col("years"))).as("year"))
      // J4 year-pruned candidate join, then containment match, then W4
      // first-position-wins per doc with deterministic tie-break.
      val matches = docYears.join(broadcast(dim), Seq("year"))
        .withColumn("pos", call_function("locate", col("leg_title"), col("text")))
        .filter(col("pos") > 0)
      val w = Window.partitionBy("doc_id")
        .orderBy(col("pos").asc, col("leg_title").asc, col("year").asc)
      matches.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("leg_title"), col("year"), col("pos"))
    }),

    // F10 regulator-name removal (preprocess_functions.py:5-22): strip a
    // pinned alternation of names.
    "f10_name_removal" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(col("text"), "\\b(spark|hash|merge)\\b", "")
            .as("scrubbed"))
    }),

    // F12 injection scrub (helpers.py:30-36): remove quote/pipe/semi
    // characters before downstream use.
    "f12_scrub" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          regexp_replace(col("props"), "[\"|;,]", " ").as("scrubbed"))
    }),

    // F14/F15 fuzzy date extraction (add_patterns.py:119-146): pull
    // `d Month yyyy` shapes out of synthesized prose and re-parse them.
    "f14_date_extract" -> ((s, d) => {
      val prose = concat(lit("issued on "),
        date_format(col("ts"), "d MMMM yyyy"), lit(" by user"))
      Tables.events(s, d)
        .select(col("event_id"), prose.as("prose"))
        .select(col("event_id"),
          regexp_extract(col("prose"),
            "([0-9]{1,2} [A-Z][a-z]+ [0-9]{4})", 1).as("date_str"))
        .withColumn("parsed",
          date_format(to_date(col("date_str"), "d MMMM yyyy"), "yyyy-MM-dd"))
    })
  )

  val oracles: Map[String, String] = Map(
    "m1_summarise" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    array_to_string((string_split(text, ' '))[1:20], ' ') AS short
        |  FROM documents),
        |p AS (SELECT doc_id, short, substr(short, 1, 120) AS prefix FROM t)
        |SELECT doc_id,
        |  CASE WHEN strpos(reverse(prefix), '.') > 0
        |       THEN substr(prefix, 1,
        |            strlen(prefix) - strpos(reverse(prefix), '.') + 1)
        |       ELSE short END AS summary
        |FROM p""".stripMargin,
    "m2_title_gate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks[1:6] AS cand, toks[7:] AS rest FROM t)
        |SELECT doc_id,
        |  len(list_intersect(list_distinct(cand), list_distinct(rest)))
        |    AS score,
        |  CASE WHEN len(list_intersect(list_distinct(cand),
        |                               list_distinct(rest))) >= 3
        |            AND len(cand) >= 3
        |       THEN array_to_string(cand, ' ') ELSE 'untitled' END AS title
        |FROM c""".stripMargin,
    "m3_keywords" ->
      """SELECT doc_id, word, tf, rk FROM (
        |  SELECT doc_id, word, tf, row_number() OVER (PARTITION BY doc_id
        |           ORDER BY tf DESC, word ASC) AS rk
        |  FROM (
        |    SELECT doc_id, word, count(*) AS tf FROM (
        |      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |        x -> x <> '' AND x NOT IN
        |          ('the','a','an','and','or','of','to','in','is','it','for',
        |           'on','with','this','that','be','as','at','by'))) AS word
        |      FROM documents) e
        |    GROUP BY doc_id, word) g) r
        |WHERE rk <= 5""".stripMargin,
    "m5_doc_type" ->
      """WITH rules(phrase, label, priority) AS (VALUES
        |  ('regulation','MSI',3), ('guidance','GD',2), ('safety','HS',2),
        |  ('spark','GD',1), ('filter','HS',1), ('join','MSI',1)),
        |heads AS (
        |  SELECT doc_id,
        |    substr(text, 1, greatest(200, n_chars // 10)) AS head
        |  FROM documents),
        |m AS (
        |  SELECT h.doc_id, r.label, r.priority
        |  FROM heads h LEFT JOIN rules r ON strpos(h.head, r.phrase) > 0),
        |r AS (SELECT doc_id, label, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY priority DESC, label ASC) AS rk FROM m)
        |SELECT doc_id, coalesce(label, 'OTHER') AS document_type
        |FROM r WHERE rk = 1""".stripMargin,
    "m6_leg_origin" ->
      """WITH dim AS (
        |  SELECT DISTINCT string_split(p_name, ' ')[1] AS leg_title,
        |    (p_partkey % 5 + 2020)::INT AS year
        |  FROM part WHERE strlen(string_split(p_name, ' ')[1]) >= 4),
        |docyears AS (
        |  SELECT doc_id, text, unnest(list_distinct(
        |    [(doc_id % 5 + 2020)::INT, (doc_id % 3 + 2020)::INT])) AS year
        |  FROM documents),
        |m AS (
        |  SELECT d.doc_id, dim.leg_title, dim.year,
        |    strpos(d.text, dim.leg_title) AS pos
        |  FROM docyears d JOIN dim USING (year)
        |  WHERE strpos(d.text, dim.leg_title) > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY pos ASC, leg_title ASC, year ASC) AS rk FROM m)
        |SELECT doc_id, leg_title, year, pos FROM r WHERE rk = 1""".stripMargin,
    "f10_name_removal" ->
      """SELECT doc_id,
        |  regexp_replace(text, '\b(spark|hash|merge)\b', '', 'g') AS scrubbed
        |FROM documents""".stripMargin,
    "f12_scrub" ->
      """SELECT event_id,
        |  regexp_replace(props, '["|;,]', ' ', 'g') AS scrubbed
        |FROM events""".stripMargin,
    // Equivalent closed form: the extracted string IS the formatted ts,
    // so the expected output derives from ts directly (oracle states the
    // answer, not the implementation).
    "f14_date_extract" ->
      """SELECT event_id,
        |  strftime(ts, '%-d %B %Y') AS date_str,
        |  strftime(ts, '%Y-%m-%d') AS parsed
        |FROM events""".stripMargin
  )
}
