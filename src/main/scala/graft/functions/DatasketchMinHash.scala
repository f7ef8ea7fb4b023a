package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-exact datasketch MinHash — SURVEY §7.4 hard-part 1 ("oracle-parity
  * for library-bound functions").
  *
  * Reproduces `datasketch.MinHash(num_perm=256, seed=1)` over the
  * reference's shingle construction exactly
  * (`lambdas/check_duplicate/utils.py:22-30`):
  *
  *   shingles = kshingle.shingleset_k(s, k)  — the SET of all UNIQUE
  *              character substrings of lengths 1..k (not just fixed-k
  *              windows)
  *   h    = sha1(shingle_utf8)[0:4] little-endian as uint32
  *   phv  = ((a·h + b) mod (2^61−1)) & (2^32−1)    (uint64 wrap on a·h)
  *   sig  = elementwise min over shingles, init 2^32−1
  *
  * The uint64 wrap of `a·h + b` matches two's-complement Long overflow
  * bit-for-bit; the mod is `Long.remainderUnsigned`. Given the same
  * preprocessed string, signatures equal the reference's hashvalues
  * bit-for-bit — pinned against an independent numpy implementation in
  * DatasketchSpec. Iteration order over the shingle set doesn't matter
  * (min is commutative), so the JVM HashSet ordering is irrelevant.
  */
object DatasketchMinHashImpl {
  private val Prime = (1L << 61) - 1
  private val MaxHash = (1L << 32) - 1

  def sha1Hash32(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    ((d(0) & 0xffL)) | ((d(1) & 0xffL) << 8) |
      ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 24)
  }

  def signature(text: UTF8String, k: Int): ArrayData = {
    val a = DatasketchPerms.A
    val b = DatasketchPerms.B
    val n = a.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, MaxHash)
    val chars = text.numChars()
    // shingleset_k: unique substrings of every length 1..k. Dedup on the
    // substring (set semantics) — duplicate updates would be idempotent
    // for the min anyway, but skipping them skips their sha1 too.
    val seen = new java.util.HashSet[UTF8String]()
    var len = 1
    while (len <= k) {
      var i = 0
      val last = chars - len
      while (i <= last) {
        val sh = text.substringSQL(i + 1, len)
        if (seen.add(sh)) {
          val h = sha1Hash32(sh.getBytes)
          var p = 0
          while (p < n) {
            // a·h wraps in uint64 exactly like signed-Long overflow
            val v = java.lang.Long.remainderUnsigned(a(p) * h + b(p), Prime) & MaxHash
            if (v < sig(p)) sig(p) = v
            p += 1
          }
        }
        i += 1
      }
      len += 1
    }
    new GenericArrayData(sig)
  }
}

/** datasketch_minhash(text) → array<long>[256] (seed-1 parity). */
case class DatasketchMinHash(child: Expression, k: Int = 5)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    DatasketchMinHashImpl.signature(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.DatasketchMinHashImpl.signature($t, $k)")
  override protected def withNewChildInternal(c: Expression): DatasketchMinHash =
    copy(child = c)
}

object DatasketchMinHash {
  def datasketch_minhash(c: Column, k: Int = 5): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DatasketchMinHash(org.apache.spark.sql.graftbridge.Bridge.expression(c), k))

  /** The reference's pre-shingle text prep (`check_duplicate/utils.py:
    * 13-19`): lowercase → `word_tokenize` → drop [[DatasketchStopwords]]
    * → re-join with single spaces. `word_tokenize` is approximated by
    * splitting punctuation runs off word characters — identical output
    * on cleaned document text; NLTK's exact tokenizer needs the trained
    * punkt sentence model (a data file, unavailable to a zero-egress
    * engine) plus treebank contraction rules, so parity is claimed for
    * the signature construction given the same token stream, not for
    * punkt itself. */
  def datasketch_preprocess(c: Column): Column = {
    import org.apache.spark.sql.functions._
    val padded = regexp_replace(lower(c), "([^a-z0-9\\s])", " $1 ")
    array_join(
      Texts.filterStopwords(Texts.tokens(padded), DatasketchStopwords.Words),
      " ")
  }
}
