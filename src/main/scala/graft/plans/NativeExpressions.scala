package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions — SURVEY.md §7.3: the scalar primitives
  * worth promoting from `Column` combinators to native expressions.
  * Each evaluates in one pass over primitive arrays/bytes (no boxing, no
  * interpreted lambda dispatch) and generates code that calls a static
  * impl, so it stays inside whole-stage codegen spans.
  */
object NativeImpl {

  /** Cosine over primitive double arrays — strict left-to-right sum, so
    * results are bit-identical to the `aggregate(zip_with(...))` fold
    * (and to DuckDB's sequential kernel). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val MinHashPrime = 2147483647L

  /** Single-pass MinHash: k-char shingles over the UTF8 text, one 64-bit
    * hash per shingle (XXH64, seed 1 — the reference's seed,
    * `check_duplicate/utils.py:25`), `numPerms` universal-hash
    * permutations folded in the same loop. One allocation (the signature
    * array); no intermediate shingle strings beyond the substring views. */
  def minhashSig(text: UTF8String, numPerms: Int, k: Int): ArrayData = {
    val sig = new Array[Long](numPerms)
    val as = new Array[Long](numPerms)
    val bs = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      sig(p) = Long.MaxValue
      as(p) = 2654435761L * (p + 1) % MinHashPrime
      bs(p) = 40503L * (p + 7) % MinHashPrime
      p += 1
    }
    val chars = text.numChars()
    val n = math.max(chars - (k - 1), 1)
    var i = 0
    while (i < n) {
      val shingle = text.substringSQL(i + 1, k)
      val h0 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        shingle.getBaseObject, shingle.getBaseOffset, shingle.numBytes(), 1)
      val h = (h0.toLong & 0xffffffffL) % MinHashPrime
      p = 0
      while (p < numPerms) {
        val v = (as(p) * h + bs(p)) % MinHashPrime
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** |A ∩ B| for two SORTED string arrays — O(n+m) merge walk with raw
    * UTF8String comparisons, replacing per-pair hash-set construction
    * (`array_intersect`) in the blocked Jaccard join's hot loop.
    *
    * `binaryCompare`, NOT `compareTo`: Spark 4.1's `UTF8String.compareTo`
    * front-runs every call with `SparkEnvUtils.isTesting` — which builds
    * a fresh Scala map from `System.getenv` — before delegating to
    * `binaryCompare`. In this hot loop (millions of pairs × ~50
    * comparisons each) that overhead measured ~50× the walk itself
    * (5,300 CPU-s → ~100 CPU-s at sf0.1). Same ordering semantics:
    * `array_sort` orders strings by the identical binary comparison. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).binaryCompare(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Long-array variant of [[sortedIntersectCount]] — the merge walk
    * over dictionary-ENCODED token ids (r15: the Jaccard verify ships
    * fixed 8-byte ids instead of UTF8 tokens, so the candidate joins
    * carry ~4× less and the hot loop compares primitives). Same
    * precondition: both sides sorted ascending. */
  def sortedIntersectCountLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Fraction of agreeing positions in two long arrays — the MinHash
    * signature-agreement estimate as one codegen'd pass, replacing the
    * interpreted `zip_with`/`filter` lambda chain in the candidate-
    * verification hot loop (one eval per candidate pair).
    *
    * Exactly `size(filter(zip_with(a,b,(x,y)=>x===y), e=>e)) / size(a)`:
    * positions beyond min(|a|,|b|) pad to null under zip_with and a null
    * element never equals — both count as disagreement here, so
    * [[RewriteMinHashAgreement]] may substitute this unconditionally. */
  def sigAgreeFrac(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val n = math.min(na, b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c.toDouble / na
  }

  /** Unicode NFC canonical composition; identity (no allocation) when
    * the input is already normalized — the common case for real text. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC))
      s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** 64-bit SimHash over a token array (murmur3 per token, seed 1). */
  def simhash64(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val lo = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes(), 1)
      val hi = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes(), 2)
      val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** cosine(array<double>, array<double>) → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.NativeImpl.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** minhash_sig(text, numPerms, k) → array<long> (xxh-free murmur3 seed-1
  * variant; engine-native fast path — not oracle-portable). */
case class MinHashSig(child: Expression, numPerms: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    NativeImpl.minhashSig(t.asInstanceOf[UTF8String], numPerms, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.plans.NativeImpl.minhashSig($t, $numPerms, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** sorted_intersect_count(array<string>|array<long>, same) → int.
  * PRECONDITION: both arrays sorted ascending (callers sort once upstream;
  * the merge walk is wrong on unsorted input). Dispatches on the STATIC
  * element type: long arrays take the primitive walk (r15). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  private lazy val isLong = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      NativeImpl.sortedIntersectCountLong(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    else
      NativeImpl.sortedIntersectCount(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "sortedIntersectCountLong" else "sortedIntersectCount"
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.NativeImpl.$fn($a, $b)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** sig_agree(array<long>, array<long>) → double (fraction equal). */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeImpl.sigAgreeFrac(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.NativeImpl.sigAgreeFrac($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

/** simhash64(array<string>) → long. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    NativeImpl.simhash64(t.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.NativeImpl.simhash64($t)")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** nfc_normalize(string) → string: Unicode NFC canonical composition —
  * the corpus-cleaning step that folds combining sequences (e + U+0301)
  * into their precomposed forms (é) so hashing/dedup/tokenization see one
  * representation per grapheme. Fast path: `Normalizer.isNormalized` is
  * a scan without allocation, and real corpora are overwhelmingly
  * already-NFC, so the hot loop rarely re-encodes. DuckDB's
  * `nfc_normalize` is the independent oracle. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    NativeImpl.nfcNormalize(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.NativeImpl.nfcNormalize($t)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** sig_min(array<long>) → array<long>: element-wise minimum across the
  * group — the MinHash signature MERGE as a custom UDAF
  * (`TypedImperativeAggregate`, SURVEY §2.11's `MinHashAgg`). min is
  * associative and commutative, so partial buffers combine map-side and
  * the shuffle carries one `numPerms`-long array per (partition, group):
  * signatures of document chunks aggregate to exactly the whole-document
  * signature without re-reading any text. Buffer is a primitive
  * long[] sized lazily from the first input; serialization is the raw
  * 8·n bytes. */
case class SigMin(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = null

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf == null) Array.fill(n)(Long.MaxValue) else buf
      var i = 0
      val m = math.min(n, b.length)
      while (i < m) {
        val x = arr.getLong(i)
        if (x < b(i)) b(i) = x
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1 == null) b2
    else if (b2 == null) b1
    else {
      var i = 0
      val m = math.min(b1.length, b2.length)
      while (i < m) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
      buf.foreach(bb.putLong)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    if (bytes.isEmpty) null
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): SigMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SigMin =
    copy(inputAggBufferOffset = newOffset)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): SigMin =
    copy(child = newChild)
  override def prettyName: String = "sig_min"
}

/** Column-level entry points + SQL registration. */
/** bloom_might_contain(text) → boolean — the sketch membership probe as
  * a NATIVE expression instead of a Scala UDF, so the Bloom prefilter
  * stays inside the whole-stage-codegen span with the explode/distinct
  * it follows (a UDF forces a codegen boundary and boxes every row).
  * The filter's serialized bits travel with the expression (plans ship
  * to executors once), and deserialization is once per task via the
  * transient lazy. Probing `mightContainBinary` on the UTF8 bytes is
  * bit-identical to the builder's `putString` (both hash the UTF-8
  * encoding), so no String materializes per row. */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.util.sketch.BloomFilter
  // (no type ascription: AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  // Array[Byte] compares by reference under case-class equality, which
  // would make two semantically identical probes never equal — defeating
  // subexpression elimination and plan-cache reuse. Compare the bits by
  // CONTENT (and keep equals/hashCode consistent).
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bits, b.bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bits)
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))
  override def nullSafeEval(t: Any): Any =
    filter.mightContainBinary(t.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }
  /** codegen entry point — keeps the generated code a single call. */
  def probe(t: UTF8String): Boolean = filter.mightContainBinary(t.getBytes)
  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object Native {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def minhash_sig(c: Column, numPerms: Int = 256, k: Int = 5): Column =
    column(MinHashSig(expression(c), numPerms, k))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
  def sig_agree(a: Column, b: Column): Column =
    column(SigAgree(expression(a), expression(b)))
  def sig_min_agg(c: Column): Column =
    column(SigMin(expression(c)).toAggregateExpression())
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def bloom_might_contain(c: Column, bits: Array[Byte]): Column =
    column(BloomMightContain(expression(c), bits))

  /** Register for SQL use in an existing session
    * (`SELECT cosine_sim(a, b) …`); [[GraftExtensions]] is the
    * session-build-time equivalent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSim(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, 256, 5), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("datasketch_minhash",
      es => graft.functions.DatasketchMinHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      es => SortedIntersectCount(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sig_agree",
      es => SigAgree(es.head, es(1)), "scala_udf")
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // from the registry into AggregateExpression itself
    reg.createOrReplaceTempFunction("sig_min",
      es => SigMin(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => NfcNormalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("json_find_key",
      es => graft.functions.JsonFindKey(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("json_flatten_paths",
      es => graft.functions.JsonFlattenPaths(es.head), "scala_udf")
  }
}
