package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/column helpers — all built from codegen'd native
  * functions (no UDFs). Hash families used by oracle-checked queries
  * are md5-based because md5 is identical across engines; xxhash64
  * variants are the fast in-engine path (rows-only queries).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct 3-gram word shingles of a text column — native codegen
    * expression; same set as the DuckDB oracle formulation
    * (list_distinct of 1-based 3-slices). */
  def shingles3(text: Column): Column =
    org.apache.spark.sql.graft.WordShingles3.column(text)

  /** MinHash value for hash-family member `i` over a shingle array:
    * min over shingles of md5(i + "|" + shingle). */
  def minhash(sh: Column, i: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(s"$i|"), x).cast("binary"))))

  /** Count of tokens that are members of `set`. */
  def tokenHits(toks: Column, set: Seq[String]): Column =
    size(filter(toks, x => x.isin(set.map(v => v: Any): _*)))

  /** Word bigrams of a text column ("a b", "b c", …). Callers must
    * guard size ≥ 2 (Spark's sequence(0, -1) is [0, -1], not []). */
  def bigrams2(text: Column): Column = {
    val toks = tokens(text)
    transform(sequence(lit(0), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
  }

  /** Word trigrams of a text column ("a b c", "b c d", …). Callers
    * must guard size ≥ 3 (same sequence caveat as [[bigrams2]]). */
  def trigrams3(text: Column): Column = {
    val toks = tokens(text)
    transform(sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1),
        element_at(toks, i + 2), element_at(toks, i + 3)))
  }

  /** The canonical composite quality score (q28's definition; shared
    * with the curation pipeline so the weights live in one place). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    (size(array_distinct(toks)).cast("double") / size(toks)) * 0.5 +
      (lit(1.0) - tokenHits(toks, Seq("the", "a")).cast("double") / size(toks)) * 0.5
  }

  /** q29's argmax-says-English predicate (shared with curation). */
  def isEnglish(text: Column): Column = {
    val toks = tokens(text)
    val sEn = tokenHits(toks, Seq("the", "a", "of", "and"))
    val sDe = tokenHits(toks, Seq("der", "die", "das", "und"))
    val sFr = tokenHits(toks, Seq("le", "la", "les", "et"))
    val sEs = tokenHits(toks, Seq("el", "los", "las", "y"))
    sEn >= sDe && sEn >= sFr && sEn >= sEs
  }
}
