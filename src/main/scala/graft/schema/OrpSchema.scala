package graft.schema

import org.apache.spark.sql.types._

/** Canonical document/graph schemas — SURVEY.md §1 (union of the Glue
  * notebook's `md_schema`, cell 3, and the TypeDB attribute lattice,
  * `orp-pbeta-gdb-schema.tql:5-130`), per FIXTURES.md §1.
  */
object OrpSchema {

  val legislativeOrigin: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("ref", StringType),
    StructField("href", StringType),
    StructField("number", StringType),
    StructField("division", StringType),
    StructField("type", StringType)))

  /** One row per regulatory document — the engine's canonical row. */
  val document: StructType = StructType(Seq(
    StructField("document_uid", StringType, nullable = false),
    StructField("raw_uri", StringType),
    StructField("uri", StringType),
    StructField("text", StringType),
    StructField("title", StringType),
    StructField("summary", StringType),
    StructField("language", StringType),
    StructField("document_type", StringType),
    StructField("document_format", StringType),
    StructField("regulator_id", StringType),
    StructField("user_id", StringType),
    StructField("status", StringType),
    StructField("version", LongType),
    StructField("hash_text", ArrayType(LongType)),
    StructField("regulatory_topic", ArrayType(StringType)),
    StructField("assigned_orp_topic", ArrayType(StringType)),
    StructField("keywords", ArrayType(StringType)),
    StructField("legislative_origins", ArrayType(legislativeOrigin)),
    StructField("date_published", TimestampType),
    StructField("date_uploaded", TimestampType)))

  /** Graph node table (TypeDB entities → normalized rows; SURVEY §1.1). */
  val entity: StructType = StructType(Seq(
    StructField("node_id", LongType, nullable = false),
    StructField("entity_type", StringType, nullable = false),
    StructField("key", StringType),
    StructField("attrs", MapType(StringType, StringType))))

  /** Graph edge table (publication / partOf relations). */
  val link: StructType = StructType(Seq(
    StructField("link_type", StringType, nullable = false),
    StructField("src_id", LongType, nullable = false),
    StructField("dst_id", LongType, nullable = false),
    StructField("attrs", MapType(StringType, StringType))))

  /** Typed view of the canonical row for Dataset[OrpDocument] use. */
  case class LegislativeOrigin(title: String, ref: String, href: String,
    number: String, division: String, `type`: String)

  case class OrpDocument(
    document_uid: String,
    raw_uri: String = null,
    uri: String = null,
    text: String = null,
    title: String = null,
    summary: String = null,
    language: String = null,
    document_type: String = null,
    document_format: String = null,
    regulator_id: String = null,
    user_id: String = null,
    status: String = "published",
    version: Long = 1L,
    hash_text: Seq[Long] = null,
    regulatory_topic: Seq[String] = null,
    assigned_orp_topic: Seq[String] = null,
    keywords: Seq[String] = null,
    date_published: java.sql.Timestamp = null,
    date_uploaded: java.sql.Timestamp = null)
}
