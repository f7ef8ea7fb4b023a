package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support — the LLM-pipeline surface for image/audio/
  * video payloads: opaque `binary` content columns with typed metadata,
  * decode / feature-extract / frame-sample stages as `mapPartitions`
  * batch transforms (the JVM analogue of pandas-UDF batching: one
  * partition = one batch, decoder state initialized once per partition).
  *
  * The actual codec libraries are NOT in this container, so [[StubCodec]]
  * is a clearly-marked deterministic fake — the Spark-side plumbing
  * (schema, batching, partitioning, column shapes) is real and tested,
  * and a real decoder drops in by replacing the one trait instance.
  */
object Multimodal {

  /** Typed metadata carried beside every binary payload. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("byte_len", LongType),
    StructField("magic", StringType)))       // sniffed container format

  /** Decoder boundary. Production: JNI/javacpp codec. Here: deterministic
    * stub so tests are hermetic. */
  trait Codec extends Serializable {
    /** bytes → fixed-length feature vector (e.g. pooled embedding). */
    def features(bytes: Array[Byte], dims: Int): Array[Float]
    /** bytes → sampled "frame" byte slices (video frame-sample stage). */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
    /** bytes → re-encoded payload at (w, h) (image resize stage). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deterministic fake: features are byte histograms folded to `dims`;
    * frames are even byte-range slices. Replace with a real codec in
    * production — the pipeline shape does not change. */
  object StubCodec extends Codec {
    def features(bytes: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < bytes.length) {
        out(java.lang.Byte.toUnsignedInt(bytes(i)) % dims) += 1.0f
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      var j = 0
      while (j < dims) { out(j) /= n; j += 1 }
      out
    }
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val span = math.max(bytes.length / math.max(n, 1), 1)
      (0 until math.min(n, bytes.length)).map { i =>
        bytes.slice(i * span, math.min(i * span + span, bytes.length))
      }
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // deterministic stub: nearest-neighbor subsample of the byte stream
      // to a w×h payload (real codec: decode → scale → re-encode)
      val n = math.max(w * h, 1)
      val out = new Array[Byte](n)
      val len = math.max(bytes.length, 1)
      var i = 0
      while (i < n) {
        out(i) = if (bytes.isEmpty) 0 else bytes((i.toLong * len / n).toInt)
        i += 1
      }
      out
    }
  }

  /** Attach media metadata columns to a frame with a `content: binary`
    * column — pure column expressions (codegen'd). Magic sniffing uses
    * hex prefixes the way file(1) does. */
  def withMediaMeta(df: DataFrame, content: String = "content"): DataFrame = {
    val hexHead = upper(hex(substring(col(content), 1, 4)))
    df.withColumn("meta", struct(
      when(hexHead.startsWith("FFD8"), "image")
        .when(hexHead.startsWith("89504E47"), "image")
        .when(hexHead.startsWith("494433"), "audio")
        .otherwise("unknown").as("media_type"),
      octet_length(col(content)).cast("long").as("byte_len"),
      hexHead.as("magic")))
  }

  /** Feature extraction as a partition-batched transform: the codec is
    * instantiated once per partition (≙ pandas-UDF iterator pattern), rows
    * stream through without collecting. Output schema: input ⊕ features.
    */
  def extractFeatures(df: DataFrame, dims: Int,
      codec: Codec = StubCodec, content: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(content)
    df.mapPartitions { rows =>
      // per-partition codec init happens here (once), not per row
      val c = codec
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ c.features(bytes, dims).toSeq)
      }
    }(enc)
  }

  /** Resize: partition-batched binary → binary transform at fixed target
    * dims; schema input ⊕ (resized, out_w, out_h). Same per-partition
    * codec-init shape as [[extractFeatures]]. */
  def resize(df: DataFrame, w: Int, h: Int,
      codec: Codec = StubCodec, content: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(content)
    df.mapPartitions { rows =>
      val c = codec
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq ++ Seq(c.resize(bytes, w, h), w, h))
      }
    }(enc)
  }

  /** Frame sampling: one input row → n frame rows (generator-shaped). */
  def sampleFrames(df: DataFrame, n: Int,
      codec: Codec = StubCodec, content: String = "content"): DataFrame = {
    val base = df.schema.fields.filter(_.name != content)
    val outSchema = StructType(base ++ Seq(
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(content)
    val keep = base.map(f => df.schema.fieldIndex(f.name))
    df.mapPartitions { rows =>
      val c = codec
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        c.sampleFrames(bytes, n).zipWithIndex.map { case (fr, i) =>
          Row.fromSeq(keep.map(r.get).toSeq ++ Seq(i, fr))
        }
      }
    }(enc)
  }

  /** Oracle-checked query surface: documents' text bytes stand in for
    * media payloads; metadata extraction is pure-expression and portable.
    */
  private def binDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("content"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_meta" -> ((s, d) => {
      withMediaMeta(binDocs(s, d))
        .select(col("doc_id"), col("meta.media_type"), col("meta.byte_len"),
          substring(col("meta.magic"), 1, 8).as("magic"))
    }),

    // Video frame-sample stage: one payload row → 8 frame rows through
    // the partition-batched generator (per-partition codec init, rows
    // stream — no collect, no state). Frames render as hex so the
    // oracle compares byte-exact content.
    "mm_frame_sample" -> ((s, d) => {
      sampleFrames(binDocs(s, d), 8)
        .select(col("doc_id"), col("frame_no"),
          upper(hex(col("frame"))).as("frame_hex"))
    }),

    // Image resize stage: binary → fixed 16×16 payload per row. The stub
    // codec's nearest-neighbor byte gather is deterministic, so the
    // resized payload itself is oracle-checkable (as hex).
    "mm_resize" -> ((s, d) => {
      resize(binDocs(s, d), 16, 16)
        .select(col("doc_id"), upper(hex(col("resized"))).as("resized_hex"),
          col("out_w"), col("out_h"))
    }),

    // Feature-extraction stage: payload → 64-dim pooled vector via the
    // partition-batched codec, then un-normalized back to integer bucket
    // counts for the cross-engine compare (float vectors don't hash
    // portably; the counts are exact).
    "mm_feature_hist" -> ((s, d) => {
      extractFeatures(binDocs(s, d), 64)
        .select(col("doc_id"), octet_length(col("content")).cast("long").as("len"),
          posexplode(col("features")).as(Seq("bucket", "f")))
        .select(col("doc_id"), col("bucket"),
          round(col("f") * col("len")).cast("int").as("cnt"))
        .filter(col("cnt") > 0)
    }))

  val oracles: Map[String, String] = Map(
    "mm_media_meta" ->
      """SELECT doc_id, 'unknown' AS media_type,
        |  octet_length(text::BLOB)::BIGINT AS byte_len,
        |  substr(upper(hex(text::BLOB)), 1, 8) AS magic
        |FROM documents""".stripMargin,
    // DuckDB has no BLOB substr, so both frame/resize oracles slice the
    // hex rendering (2 chars per byte) — byte i lives at hex[2i+1, 2].
    "mm_frame_sample" ->
      """WITH b AS (SELECT doc_id, upper(hex(text::BLOB)) h,
        |             octet_length(text::BLOB) len FROM documents),
        |s AS (SELECT doc_id, h, greatest(len // 8, 1) AS span FROM b)
        |SELECT doc_id, CAST(i AS INT) AS frame_no,
        |       substr(h, 2 * i * span + 1, 2 * span) AS frame_hex
        |FROM s, generate_series(0, 7) t(i)""".stripMargin,
    "mm_resize" ->
      """WITH b AS (SELECT doc_id, upper(hex(text::BLOB)) h,
        |             octet_length(text::BLOB) len FROM documents),
        |g AS (SELECT doc_id, i,
        |        substr(h, 2 * CAST((i * len) // 256 AS INT) + 1, 2) p
        |      FROM b, generate_series(0, 255) t(i))
        |SELECT doc_id, string_agg(p, '' ORDER BY i) AS resized_hex,
        |       16 AS out_w, 16 AS out_h
        |FROM g GROUP BY doc_id""".stripMargin,
    // Histogram of byte values mod 64; the byte value is reconstructed
    // from its two hex digits. The series bound is static (docs are
    // < 16 KiB) because this DuckDB build lacks lateral generate_series.
    "mm_feature_hist" ->
      """WITH b AS (SELECT doc_id, upper(hex(text::BLOB)) h,
        |             octet_length(text::BLOB) len FROM documents),
        |v AS (SELECT doc_id,
        |        ((strpos('0123456789ABCDEF', substr(h, 2*i+1, 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(h, 2*i+2, 1)) - 1) % 64
        |          AS bucket
        |      FROM b, generate_series(0, 16383) t(i) WHERE i < len)
        |SELECT doc_id, CAST(bucket AS INT) AS bucket, CAST(count(*) AS INT) cnt
        |FROM v GROUP BY doc_id, bucket""".stripMargin)
}
