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
}
