package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink operators — SURVEY.md §2.1 (S10/S11 parquet/CSV reads,
  * F21 JSON) and §2.2 (K1/K2 partitioned writes). Each query exercises a
  * real read or write path end-to-end and returns a frame whose expected
  * content is independently derivable by the oracle (round-trip
  * identity / partition census), so correctness of the I/O path itself
  * is what's checked.
  */
object SourceSinkQueries {
  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(name: String): String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"), s"graft-$name")
    d.getAbsolutePath
  }

  val queries: Map[String, Q] = Map(
    // S11/K-CSV: write events to headered CSV, read back with an explicit
    // schema (legislation_table_update.py:75-77 CSV dim load). Round-trip
    // identity is the check; timestamps travel as formatted strings.
    "s11_csv_roundtrip" -> ((s, d) => {
      val out = tmpDir(s"csv-${d.replace('/', '_')}")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("ts_s", StringType)))
      s.read.option("header", "true").schema(schema).csv(out)
    }),

    // S12: JSON-lines sink + source round-trip — the interchange format
    // every crawl/annotation pipeline emits. Write is one narrow pass;
    // read-back uses an EXPLICIT schema (schema inference at 100 TB is a
    // full extra scan of every byte — never infer in production paths).
    "s12_jsonl_roundtrip" -> ((s, d) => {
      val out = tmpDir(s"jsonl-${d.replace('/', '_')}")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .write.mode("overwrite").json(out)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      s.read.schema(schema).json(out)
        .select("event_id", "user_id", "event_type", "value")
    }),

    // S15: plain text-lines sink + source round-trip — the lowest common
    // denominator every scraper/annotation hand-off still speaks (one
    // record per line, id TAB payload). Write and read are both narrow
    // single-pass; the parse back out of the line is row-local string
    // arithmetic. Rounds out the format matrix: csv (s11), jsonl (s12),
    // orc (s13), parquet+mergeSchema (s14), text (here).
    "s15_text_lines" -> ((s, d) => {
      val out = tmpDir(s"text-${d.replace('/', '_')}")
      // Percent-encode line breaks before the line-per-record write
      // (r20 review): a text() sink has no record framing beyond '\n',
      // so an embedded newline used to split one doc into two rows (the
      // second with an unparseable id). '%' expands first, so a literal
      // "%0A" in user text can never collide with an encoded newline;
      // decode reverses in the opposite order. Round-trip exact for ANY
      // text.
      def enc(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(regexp_replace(c,
          "%", "%25"), "\n", "%0A"), "\r", "%0D")
      def dec(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(regexp_replace(c,
          "%0A", "\n"), "%0D", "\r"), "%25", "%")
      Tables.documents(s, d)
        .select(concat(col("doc_id").cast("string"), lit("\t"),
          enc(col("text"))).as("value"))
        .write.mode("overwrite").text(out)
      val tab = instr(col("value"), "\t")
      s.read.text(out)
        .select(substring_index(col("value"), "\t", 1).cast("long")
          .as("doc_id"),
          dec(col("value").substr(tab + 1, length(col("value"))))
            .as("text"))
    }),

    // S13/K-ORC: columnar ORC write partitioned by lang, read back with a
    // partition-pruning filter — the read must touch only the lang=en
    // directory (PartitionFilters in the scan), the same layout contract
    // k2 pins for parquet.
    "s13_orc_partitioned" -> ((s, d) => {
      val out = tmpDir(s"orc-${d.replace('/', '_')}")
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").orc(out)
      s.read.orc(out)
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("n_chars"))
    }),

    // S14 schema evolution: a corpus written over months accretes columns
    // (v2 files carry n_chars, v1 files don't). mergeSchema unions the
    // footer schemas at planning time — old files surface NULL for the
    // new column, no rewrite of historical data. (Merge only on the
    // evolving prefix; corpus-wide mergeSchema at 100 TB reads every
    // footer — pin the schema once evolution settles.)
    "s14_merge_schema" -> ((s, d) => {
      val out = tmpDir(s"evolve-${d.replace('/', '_')}")
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
        .write.mode("overwrite").parquet(s"$out/v1")
      docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          count(col("n_chars")).as("n_with_chars"),
          coalesce(sum("n_chars"), lit(0L)).cast("long").as("sum_chars"))
    }),

    // F21/K3 JSON: serialize rows to JSON strings (sorted-key envelope ≙
    // typedb_ingestion.py:16-25), parse back with from_json, project the
    // fields — serialization round-trip identity.
    "f21_json_roundtrip" -> ((s, d) => {
      val payload = to_json(struct(col("event_id"), col("event_type"),
        col("user_id")))
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("user_id", LongType)))
      Tables.events(s, d)
        .select(payload.as("js"))
        .select(from_json(col("js"), schema).as("r"))
        .select(col("r.event_id").as("event_id"),
          col("r.event_type").as("event_type"),
          col("r.user_id").as("user_id"))
    }),

    // K1/K2 partitioned parquet write (df.write.partitionBy — the
    // uid-prefix partitioning of the ORPML sink): write documents
    // partitioned by lang, read back, census per partition. At 100 TB
    // partitioning by a low-cardinality key like lang keeps file counts
    // sane; the read side prunes partitions on the lang filter (verified
    // via PartitionFilters in explain).
    "k2_partitioned_write" -> ((s, d) => {
      val out = tmpDir(s"parq-${d.replace('/', '_')}")
      Tables.documents(s, d)
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang").isin("en", "de", "zh"))
        .groupBy("lang")
        .agg(count("*").as("n"), sum("n_chars").as("chars"))
    }),

    // K1 ORPML render (the XML document body the reference PUTs to S3,
    // orpml_generation.py): row → XML envelope via Spark's native to_xml
    // (StaxXmlGenerator — rowTag wrapper, 4-space indent, &/< escaped).
    // Oracle rebuilds the exact string with chr(10) + entity replaces.
    "k1_orpml_render" -> ((s, d) => {
      // regexp_replace (r20 review): StAX providers disagree on whether
      // text-node '>' is escaped (the JDK's sjsxp writes '&gt;',
      // Woodstox leaves '>') and XML requires neither, so the rendered
      // string is normalized to the unescaped form to make the output
      // provider-independent. A literal "&gt;" IN the text arrives here
      // as "&amp;gt;" (the '&' itself is escaped first), so the rewrite
      // can never un-escape user content.
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(
            to_xml(struct(col("doc_id"), col("lang"), col("source"),
              substring(col("text"), 1, 40).as("head")),
              java.util.Map.of("rowTag", "orpml")),
            "&gt;", ">").as("orpml"))
    }),

    // K1 read side — ORPML ingest (finalise_orpml.py:47-70 parse_orpml +
    // parse_beautifulsoup_element): an externally-produced ORPML document
    // with the reference's nested header sections (dublinCore / dcat /
    // orp) is parsed back to typed columns with from_xml, proving the
    // engine can INGEST ORPML, not only render it. The round trip here
    // renders the nested header from documents, parses it, and flattens —
    // so the oracle can recompute every output column straight from the
    // table and any parse defect (lost nesting, bad unescape, type
    // coercion) diverges. Row-local projection both ways: zero exchanges
    // at any corpus size.
    "k1_orpml_parse" -> ((s, d) => {
      val rendered = Tables.documents(s, d).select(
        to_xml(struct(
          // header text fields are trimmed: the XML parser's
          // surrounding-whitespace handling makes un-trimmed leaf text
          // ill-defined across parsers, so ORPML headers declare trimmed
          // values (the reference's BeautifulSoup `.text` behaves alike)
          struct(col("doc_id").as("identifier"),
            trim(substring(col("text"), 1, 40)).as("title"),
            col("lang").as("language")).as("dublinCore"),
          struct(col("source").as("publisher")).as("dcat"),
          // trim: XML surrounding-whitespace semantics would otherwise
          // leak into the comparison when the span lands on a word gap
          struct(trim(substring(col("text"), 41, 60)).as("summary"))
            .as("orp")),
          java.util.Map.of("rowTag", "orpml")).as("orpml"))
      val header = StructType(Seq(
        StructField("dublinCore", StructType(Seq(
          StructField("identifier", LongType),
          StructField("title", StringType),
          StructField("language", StringType)))),
        StructField("dcat", StructType(Seq(
          StructField("publisher", StringType)))),
        StructField("orp", StructType(Seq(
          StructField("summary", StringType))))))
      rendered
        .select(from_xml(col("orpml"), header,
          java.util.Map.of()).as("h"))
        .select(col("h.dublinCore.identifier").as("doc_id"),
          // empty header fields round-trip as null through to_xml/from_xml
          // (an empty element parses as missing) while the oracle
          // recomputes '' — coalesce so a text shorter than the 40/100
          // spans can't flip the comparison null-vs-empty
          coalesce(col("h.dublinCore.title"), lit("")).as("title"),
          coalesce(col("h.dublinCore.language"), lit("")).as("language"),
          coalesce(col("h.dcat.publisher"), lit("")).as("publisher"),
          coalesce(col("h.orp.summary"), lit("")).as("summary"))
    }),

    // K4 dim-table upsert (legislation_table_update.py:100-112: the CSV
    // dim refresh put_item loop — last-writer-wins overwrite by key, new
    // keys inserted). Relationally: incoming wins on key-match (in-place
    // attribute overwrite), unmatched current rows pass through — one
    // keyed left_anti + union, no full-table rewrite of untouched rows'
    // payload. Mutation batch derived from `nation`: every 2nd key gets
    // an amended name; keys +100 are net-new inserts.
    "k4_dim_upsert" -> ((s, d) => {
      val cur = Tables.nation(s, d)
        .select(col("n_nationkey").as("key"), col("n_name").as("name"),
          col("n_regionkey").as("region"))
      val inc = cur.filter(col("key") % 2 === 0)
        .select(col("key"), concat(col("name"), lit(" (2026 ed.)")).as("name"),
          col("region"))
        .unionByName(
          cur.filter(col("key") % 7 === 0)
            .select((col("key") + 100).as("key"),
              concat(lit("NEW "), col("name")).as("name"), col("region")))
      cur.join(inc.select("key"), Seq("key"), "left_anti")
        .withColumn("op", lit("kept"))
        .unionByName(inc.withColumn("op",
          when(col("key") >= 100, "inserted").otherwise("overwritten")))
    }),

    // S1/S3 binary-file scan (the reference's S3 object gets + bucket
    // listing, pdf_to_orpml.py:60-74 / Glue cell 5): enumerate the sf
    // dir as binary files with path/length metadata, classify by
    // extension (P4 format whitelist). Oracle: DuckDB glob() over the
    // same directory.
    // S4 HTML title/body extraction — the PARSE half of the reference's
    // html_to_orpml fetch (html_to_orpml.py:20-67; the HTTP GET itself
    // stays out of engine scope). The reference's three BeautifulSoup
    // strategies become one data-driven fallback chain: body from
    // #contentContainer, else <main> paragraphs, else #mainContent
    // paragraphs; title from the last breadcrumb <li> when an <ol>
    // exists, else <head><title>. Three HTML shapes are constructed from
    // table columns (doc_id % 3) so every branch is exercised; regexes
    // are non-greedy and lookaround-free so Java and RE2 agree. Narrow
    // per-row op — no shuffle.
    "s4_html_extract" -> ((s, d) => {
      val head = graft.functions.Texts.smartShorten(col("text"), 6)
      val t = concat(lit("Doc "), col("doc_id"), lit(" "), col("lang"))
      val html = when(col("doc_id") % 3 === 0, concat(
        lit("<html><head><title>"), t, lit("</title></head><body>"),
        lit("<div id=\"contentContainer\">"), head,
        lit("</div></body></html>")))
        .when(col("doc_id") % 3 === 1, concat(
          lit("<html><head><title>"), t, lit("</title></head><body>"),
          lit("<ol><li>Home</li><li>"), upper(t), lit("</li></ol>"),
          lit("<main><p>"), head, lit("</p><p>"), col("source"),
          lit("</p></main></body></html>")))
        .otherwise(concat(
          lit("<html><head><title>"), t, lit("</title></head><body>"),
          lit("<div id=\"mainContent\"><p>"), head,
          lit("</p></div></body></html>")))
      val lis = regexp_extract_all(html, lit("<li>(.*?)</li>"), lit(1))
      val title = when(size(lis) > 0, element_at(lis, -1))
        .otherwise(regexp_extract(html, "<title>(.*?)</title>", 1))
      val cc = regexp_extract(html,
        "<div id=\"contentContainer\">(.*?)</div>", 1)
      val mainPs = regexp_extract_all(
        regexp_extract(html, "<main>(.*?)</main>", 1),
        lit("<p>(.*?)</p>"), lit(1))
      val mcPs = regexp_extract_all(
        regexp_extract(html, "<div id=\"mainContent\">(.*?)</div>", 1),
        lit("<p>(.*?)</p>"), lit(1))
      val body = when(cc =!= "", cc)
        .when(size(mainPs) > 0, array_join(mainPs, " "))
        .otherwise(array_join(mcPs, " "))
      Tables.documents(s, d)
        .select(col("doc_id"), title.as("title"),
          regexp_replace(body, "\\s+", " ").as("body"))
    }),

    "s1_binary_listing" -> ((s, d) => {
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(d)
        .select(
          element_at(split(col("path"), "/"), -1).as("file"),
          element_at(split(col("path"), "\\."), -1).as("document_format"),
          (col("length") > 0).as("non_empty"))
        .filter(col("document_format").isin("parquet"))
        .select("file", "document_format", "non_empty")
    }),

    // S2 S3 metadata head (pdf_to_orpml.py:77-89): the uuid / regulator /
    // topic metadata that drives the reference pipeline rides on the
    // OBJECT, not in its content. Modeled as a binaryFile scan that
    // reads path + length only (no content materialization — the column
    // is pruned), derives the object identity, and joins a broadcast
    // sidecar dim carrying the head metadata. Oracle: DuckDB read_blob
    // sizes + the same VALUES dim.
    "s2_metadata_head" -> ((s, d) => {
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet").load(d)
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("length").as("bytes"))
      val metaDim = s.createDataFrame(MetaSidecar)
        .toDF("family", "kind", "regulator")
      files
        .withColumn("family", element_at(split(col("file"), "\\."), 1))
        .withColumn("uid", md5(col("file")))
        .join(broadcast(metaDim), Seq("family"), "left")
        .select("file", "uid", "family", "kind", "regulator", "bytes")
    }),

    // S2b file-provenance carry on a columnar read: input_file_name()
    // attaches the source object to every row (the reference threads the
    // S3 key through each lambda the same way) — census per file proves
    // the sidecar column survives the scan → shuffle → agg pipeline.
    "s2_file_provenance" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("file", element_at(split(input_file_name(), "/"), -1))
        .groupBy("file").agg(count("*").as("n_rows"))
    }),

    // S10 parquet scan with pushdown: projection + predicate must reach
    // the scan (PushedFilters) — the plan shape is asserted in tests; the
    // result here is the correctness side.
    // The bound sits inside the synthetic shipdate range (1995..2001) so
    // the entry returns a selective-but-nonempty slice (~0.6% of
    // lineitem) — the value path is hash-checked, not just the
    // PushedFilters plan pin (r13 verdict: the former 2024 bound was
    // vacuously empty).
    "s10_pushdown_scan" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "2001-06-01" && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_quantity"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
    })
  )

  /** Sidecar head-metadata dim (family → kind/regulator) shared by the
    * S2 query and its oracle. */
  private val MetaSidecar = Seq(
    ("documents", "corpus", "HSE"), ("embeddings", "vectors", "HSE"),
    ("lineitem", "fact", "ORR"), ("orders", "fact", "ORR"),
    ("customer", "dim", "ORR"), ("supplier", "dim", "ORR"),
    ("part", "dim", "ORR"), ("nation", "dim", "GEO"),
    ("region", "dim", "GEO"), ("events", "fact", "OFCOM"))

  private val metaSidecarSql = MetaSidecar
    .map { case (f, k, r) => s"('$f','$k','$r')" }.mkString(",\n  ")

  /** glob/read_blob oracles need a literal directory (DuckDB table
    * functions only accept constant arguments). Verify.main stamps the
    * actual sweep dir into this property from its sfDir argument, so
    * the sf0.1 / CPU-variation sweeps run the oracle against the same
    * data the Spark query read — no hardcoded-scale carve-out. */
  private def VerifySfDir: String =
    sys.props.getOrElse("graft.verify.sfDir", "/root/testdata/sf0.01")

  // def, not val: the dir property must be read at dump time, after
  // Verify.main has set it (object-init order is otherwise fragile).
  def oracles: Map[String, String] = Map(
    "s14_merge_schema" ->
      """SELECT lang, count(*) AS n_rows,
        |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
        |  CAST(coalesce(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END), 0)
        |       AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "s4_html_extract" ->
      """WITH base AS (
        |  SELECT doc_id, source, 'Doc ' || doc_id || ' ' || lang AS t,
        |    array_to_string((string_split(text, ' '))[1:6], ' ') AS head
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      '<html><head><title>' || t ||
        |      '</title></head><body><div id="contentContainer">' || head ||
        |      '</div></body></html>'
        |    WHEN doc_id % 3 = 1 THEN
        |      '<html><head><title>' || t ||
        |      '</title></head><body><ol><li>Home</li><li>' || upper(t) ||
        |      '</li></ol><main><p>' || head || '</p><p>' || source ||
        |      '</p></main></body></html>'
        |    ELSE
        |      '<html><head><title>' || t ||
        |      '</title></head><body><div id="mainContent"><p>' || head ||
        |      '</p></div></body></html>' END AS html
        |  FROM base),
        |e AS (
        |  SELECT doc_id,
        |    regexp_extract_all(html, '<li>(.*?)</li>', 1) AS lis,
        |    regexp_extract(html, '<title>(.*?)</title>', 1) AS ttl,
        |    regexp_extract(html, '<div id="contentContainer">(.*?)</div>', 1)
        |      AS cc,
        |    regexp_extract_all(regexp_extract(html, '<main>(.*?)</main>', 1),
        |      '<p>(.*?)</p>', 1) AS mainps,
        |    regexp_extract_all(
        |      regexp_extract(html, '<div id="mainContent">(.*?)</div>', 1),
        |      '<p>(.*?)</p>', 1) AS mcps
        |  FROM h)
        |SELECT doc_id,
        |  CASE WHEN len(lis) > 0 THEN lis[-1] ELSE ttl END AS title,
        |  regexp_replace(
        |    CASE WHEN cc <> '' THEN cc
        |         WHEN len(mainps) > 0 THEN array_to_string(mainps, ' ')
        |         ELSE array_to_string(mcps, ' ') END, '\s+', ' ', 'g') AS body
        |FROM e""".stripMargin,
    "s1_binary_listing" ->
      s"""SELECT parse_filename(file) AS file,
         |       'parquet' AS document_format,
         |       true AS non_empty
         |FROM glob('$VerifySfDir/*.parquet')""".stripMargin,
    "s2_metadata_head" ->
      s"""WITH m(family, kind, regulator) AS (VALUES
         |  $metaSidecarSql),
         |f AS (SELECT parse_filename(filename) AS file, size AS bytes
         |      FROM read_blob('$VerifySfDir/*.parquet'))
         |SELECT file, md5(file) AS uid, string_split(file, '.')[1] AS family,
         |       kind, regulator, bytes
         |FROM f LEFT JOIN m ON string_split(file, '.')[1] = m.family""".stripMargin,
    "s2_file_provenance" ->
      "SELECT 'documents.parquet' AS file, count(*) AS n_rows FROM documents",
    "s11_csv_roundtrip" ->
      """SELECT event_id, user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
        |FROM events""".stripMargin,
    "f21_json_roundtrip" ->
      "SELECT event_id, event_type, user_id FROM events",
    "s12_jsonl_roundtrip" ->
      """SELECT event_id, user_id, event_type, round(value, 2) AS value
        |FROM events""".stripMargin,
    "s13_orc_partitioned" ->
      "SELECT doc_id, n_chars FROM documents WHERE lang = 'en'",
    "s15_text_lines" ->
      "SELECT doc_id, text FROM documents",
    "k2_partitioned_write" ->
      """SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents
        |WHERE lang IN ('en','de','zh') GROUP BY lang""".stripMargin,
    "k1_orpml_render" ->
      """SELECT doc_id,
        |  '<orpml>' || chr(10) ||
        |  '    <doc_id>' || doc_id || '</doc_id>' || chr(10) ||
        |  '    <lang>' ||
        |    replace(replace(lang, '&', '&amp;'), '<', '&lt;') ||
        |    '</lang>' || chr(10) ||
        |  '    <source>' ||
        |    replace(replace(source, '&', '&amp;'), '<', '&lt;') ||
        |    '</source>' || chr(10) ||
        |  '    <head>' ||
        |    replace(replace(substr(text, 1, 40), '&', '&amp;'), '<', '&lt;') ||
        |    '</head>' || chr(10) ||
        |  '</orpml>' AS orpml
        |FROM documents""".stripMargin,
    // the parse output is recomputed straight from the table — the XML
    // round trip must be the identity on every header field
    "k1_orpml_parse" ->
      """SELECT doc_id, trim(substr(text, 1, 40)) AS title, lang AS language,
        |  source AS publisher, trim(substr(text, 41, 60)) AS summary
        |FROM documents""".stripMargin,
    "k4_dim_upsert" ->
      """WITH cur AS (
        |  SELECT n_nationkey AS key, n_name AS name, n_regionkey AS region
        |  FROM nation),
        |inc AS (
        |  SELECT key, name || ' (2026 ed.)' AS name, region
        |  FROM cur WHERE key % 2 = 0
        |  UNION ALL
        |  SELECT key + 100, 'NEW ' || name, region
        |  FROM cur WHERE key % 7 = 0)
        |SELECT key, name, region, 'kept' AS op
        |FROM cur WHERE key NOT IN (SELECT key FROM inc)
        |UNION ALL
        |SELECT key, name, region,
        |  CASE WHEN key >= 100 THEN 'inserted' ELSE 'overwritten' END AS op
        |FROM inc""".stripMargin,
    "s10_pushdown_scan" ->
      """SELECT l_orderkey, l_quantity,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship
        |FROM lineitem
        |WHERE l_shipdate >= '2001-06-01' AND l_quantity > 45""".stripMargin
  )
}
