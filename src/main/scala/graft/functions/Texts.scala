package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text/hash primitives — SURVEY.md §2.9 (F1–F12, F18) re-expressed
  * as codegen'd `Column` combinators over `org.apache.spark.sql.functions`.
  *
  * Portability note: every function that participates in an oracle-checked
  * query is built from operations with exact DuckDB equivalents (md5,
  * regexp_replace with RE2-safe patterns, array ops), so results are
  * bit-identical across engines. Engine-only variants (xxhash64-based
  * MinHash/SimHash, see [[Hashes]]) are faster but not oracle-checked.
  */
object Texts {

  /** F1/F2/F3 `clean_text` (reference `pdf_to_orpml.py:29-57`,
    * `remove_excess_punctuation` `:20-26`): tag strip, dot-run collapse,
    * doubled-punct collapse, whitespace collapse, trim, lowercase.
    * Patterns avoid backreferences so RE2 (DuckDB) and Java regex agree.
    */
  def cleanText(c: Column): Column = {
    val noTags   = regexp_replace(c, "<[^>]*>", " ")
    val noDots   = regexp_replace(noTags, "\\.\\.\\.+", ".")
    val noDouble = regexp_replace(noDots, "([.]|,|;|:|!|\\?)[.,;:!?]+", ".")
    val oneSpace = regexp_replace(noDouble, "\\s+", " ")
    lower(trim(oneSpace))
  }

  /** Whitespace tokenizer (F4 front half) — empty tokens removed. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** F4 stopword removal over a token array (StopWordsRemover analogue,
    * reference `check_duplicate/utils.py:13-19`). NOTE: `array_except`
    * also deduplicates — use [[filterStopwords]] when multiset semantics
    * matter (e.g. term-frequency counting). */
  def removeStopwords(toks: Column, stopwords: Seq[String]): Column =
    array_except(toks, array(stopwords.map(lit): _*))

  /** Multiset-preserving stopword filter (duplicates kept). */
  def filterStopwords(toks: Column, stopwords: Seq[String]): Column =
    filter(toks, t => !t.isin(stopwords.map(x => x: Any): _*))

  /** Reference stopword core (NLTK english head) + ORP domain extensions —
    * pinned list so tests/oracles are deterministic. */
  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
      "on", "with", "this", "that", "be", "as", "at", "by")

  /** F6 k-character shingles (reference `check_duplicate/utils.py:22-25`,
    * k=5): substring windows over the cleaned text. */
  def charShingles(c: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k)))

  /** Word n-grams for n-gram Jaccard dedup. */
  def wordNgrams(toks: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " "))

  /** F8 stable 60-bit id from md5 (reference SHAKE-256 node ids,
    * `misc/stream_update_process/utils/functions.py:5-7`): 15 hex digits →
    * non-negative long, identical to DuckDB
    * `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** F11 `smart_shortener` (reference `lambdas/summarisation/utils.py:4-15`):
    * first `maxWords` tokens of a LITERAL single-space split, re-joined.
    * Deliberately NOT a whitespace-class split and NOT empty-filtering
    * (r20 review considered both): the reference is `text.split(' ')`,
    * which keeps the empty strings doubled spaces produce — so under
    * consecutive whitespace the shortened text carries fewer real words,
    * faithfully. Parity beats prettiness here; `tokens` is the
    * empty-filtering whitespace split for everything non-reference. */
  def smartShorten(c: Column, maxWords: Int): Column =
    array_join(slice(split(c, " "), 1, maxWords), " ")

  /** F18 numeric-token extraction (reference year detection,
    * `legislative_origin_extraction.py:45-53`). */
  def extractNumbers(c: Column): Column =
    regexp_extract_all(c, lit("[0-9]+"), lit(0))

  /** F24 hierarchical topic-path expansion (Glue `get_topic_path`):
    * "a/b/c" → ["a", "a/b", "a/b/c"]. */
  def topicPaths(c: Column): Column = {
    val parts = split(c, "/")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, lit(1), i), "/"))
  }

  /** Token count (text-analysis primitive). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Stopword ratio ∈ [0,1] — quality-scoring primitive. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val stops = filter(toks, t => t.isin(StopWords.map(x => x: Any): _*))
    round(size(stops).cast("double") / greatest(size(toks), lit(1)), 6)
  }

  /** Mean token length — quality-scoring primitive. */
  def avgTokenLen(c: Column): Column = {
    val toks = tokens(c)
    round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)), 6)
  }
}
