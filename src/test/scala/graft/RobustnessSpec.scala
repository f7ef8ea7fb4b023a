package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input behavior of the ingest surface: at 100 TB there WILL
  * be corrupt records in every crawl drop, and the pipeline contract is
  * quarantine-and-continue (PERMISSIVE + corrupt-record column), with
  * FAILFAST reserved for formats that must be trusted end-to-end. */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def writeMixedJson(): String = {
    val dir = new java.io.File("/tmp/graft-test-badjson")
    dir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(dir, "part-0.json").toPath,
      java.util.List.of(
        """{"a": 1, "b": "ok"}""",
        """{"a": 2, "b": "also ok"}""",
        """{"a": THIS IS NOT JSON""",
        """{"a": "not-a-long", "b": "type mismatch"}"""))
    dir.toString
  }

  test("PERMISSIVE json read quarantines corrupt rows, keeps good ones") {
    val dir = writeMixedJson()
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark requires materializing before filtering on the internal
    // corrupt-record column (SPARK-21610)
    val df = spark.read.schema(schema).json(dir).cache()
    try {
      assert(df.count() == 4)
      val good = df.filter($"_corrupt_record".isNull)
        .select($"a", $"b").as[(Long, String)].collect().toSet
      assert(good == Set((1L, "ok"), (2L, "also ok")))
      val quarantined = df.filter($"_corrupt_record".isNotNull).count()
      assert(quarantined == 2, "both the broken line and the type " +
        "mismatch must land in quarantine, not kill the job")
    } finally df.unpersist()
  }

  test("malformed ORPML quarantines as null struct; good rows parse " +
    "(the k1_orpml_parse ingest contract)") {
    // from_xml is PERMISSIVE by default: a broken envelope yields a null
    // header struct (→ null columns downstream), never a job failure —
    // the quarantine-and-continue posture the 100 TB crawl drop needs.
    val header = StructType(Seq(
      StructField("dublinCore", StructType(Seq(
        StructField("identifier", LongType),
        StructField("language", StringType))))))
    val docs = Seq(
      "<orpml><dublinCore><identifier>7</identifier>" +
        "<language>en</language></dublinCore></orpml>",
      "<orpml><dublinCore><identifier>NOT A NUMBER</identifier>" +
        "<language>de</language></dublinCore></orpml>",
      "THIS IS NOT XML AT ALL").toDF("orpml")
    val parsed = docs
      .select(from_xml($"orpml", header, new java.util.HashMap[String, String]())
        .as("h"))
      .select($"h.dublinCore.identifier".as("id"),
        $"h.dublinCore.language".as("lang"))
      .collect()
    assert(parsed.length == 3, "no row is dropped — quarantine, not loss")
    assert(parsed(0).getLong(0) == 7L && parsed(0).getString(1) == "en")
    // a field type mismatch voids the WHOLE record (PERMISSIVE nulls the
    // header struct, it does not salvage sibling fields) — quarantine
    // filters are `h IS NULL`, never per-field
    assert(parsed(1).isNullAt(0) && parsed(1).isNullAt(1))
    // structurally broken input likewise nulls the whole header
    assert(parsed(2).isNullAt(0) && parsed(2).isNullAt(1))
  }

  test("FAILFAST surfaces the malformed row as a job error") {
    val dir = writeMixedJson()
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.option("mode", "FAILFAST").schema(schema).json(dir)
        .collect()
    }
    // the malformed-record class sits in the cause chain under the
    // generic FAILED_READ_FILE wrapper
    def chain(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ chain(t.getCause)
    assert(chain(e).exists(_.toUpperCase.contains("MALFORMED")),
      chain(e).mkString(" | "))
  }

  test("s15 text-lines round-trip survives embedded newlines and " +
    "percent signs (r20 review: a raw '\\n' used to split one doc " +
    "into two rows, the second with an unparseable id)") {
    // a tiny documents table whose text exercises every encoding case:
    // newline, CR, literal '%', and the adversarial literal "%0A"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-s15-nl-").toString
    val docs = Seq(
      (1L, "line one\nline two", "en", "src", 17L),
      (2L, "carriage\rreturn", "en", "src", 15L),
      (3L, "50% of docs; literal %0A stays put", "en", "src", 34L),
      (4L, "plain", "en", "src", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val back = operators.SourceSinkQueries
      .queries("s15_text_lines")(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == want.toSeq,
      s"round-trip diverged:\n got ${back.toSeq}\nwant ${want.toSeq}")
  }
}
