package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text analysis operators (SURVEY §2.E) — language ID, quality
  * scoring, token counting, fingerprinting. All per-row column
  * expressions: embarrassingly parallel, whole-stage codegen, no
  * shuffle at all (narrow transformations over the scan).
  */
object TextAnalysis {

  private val bpeIshPattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  /** q27: token counting — whitespace tokens + a BPE-ish regex count. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      regexp_count(col("text"), lit(bpeIshPattern)).cast("long").as("n_re_tokens"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks))
        .as("mean_tok_len"))
  }

  /** q28: quality scoring — type/token ratio, stopword ratio, composite. */
  def docQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stop = Seq("the", "a")
    Tables.documents(s, dir)
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_unique"),
        tokenHits(toks, stop).cast("long").as("n_stop"))
      .withColumn("ttr", col("n_unique").cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("quality",
        col("ttr") * 0.5 + (lit(1.0) - col("stop_ratio")) * 0.5)
  }

  /** q29: language ID via per-language stopword-hit scores with a
    * deterministic argmax (n-gram-heuristic family). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val sets = Seq(
      "en" -> Seq("the", "a", "of", "and"),
      "de" -> Seq("der", "die", "das", "und"),
      "fr" -> Seq("le", "la", "les", "et"),
      "es" -> Seq("el", "los", "las", "y"))
    val scored = Tables.documents(s, dir).select(
      (col("doc_id") +: col("lang").as("lang") +:
        sets.map { case (l, ws) => tokenHits(toks, ws).cast("long").as(s"s_$l") }): _*)
    scored.withColumn("pred_lang",
      when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
        col("s_en") >= col("s_es"), "en")
        .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
        .when(col("s_fr") >= col("s_es"), "fr")
        .otherwise("es"))
      .withColumn("is_correct", (col("pred_lang") === col("lang")).cast("int"))
  }

  /** q32: corpus word frequency — explode + count + deterministic
    * top-k; the shuffle moves (token, partial count) pairs only. */
  def wordFreq(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** q50: unigram LM score — per-doc mean log10 corpus frequency of
    * its tokens (the standard cheap quality/perplexity proxy for
    * corpus filtering). Two shuffles: token-frequency agg + doc agg;
    * at 100 TB the frequency table is broadcast after aggregation. */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    tok.join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(round(avg(log10(col("cnt"))), 4).as("lm_score"),
        count(lit(1)).as("n_tokens"))
  }

  /** q30: fingerprinting — full-content md5 + min-shingle fingerprint
    * (the rolling-hash-family document signature). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"),
      array_min(transform(shingles3(col("text")),
        x => md5(x.cast("binary")))).as("min_shingle_hash"))
}
