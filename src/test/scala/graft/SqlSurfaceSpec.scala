package graft

import graft.operators.{Dedup, Events, Pipeline, Privacy, Relational, Sampling, Similarity, Sketch, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL surface, proven FAMILY-WIDE (round-10, VERDICT Next #5):
  * q268 pinned "a reference user could run plain SQL" for one
  * relational query; this sweep generalizes it — the catalog views
  * are registered once and a representative operator from EVERY
  * family (relational, event/CDC, dedup, ANN, text, sketch) is run
  * twice, as its DataFrame plan and as LITERAL Spark SQL, and the
  * row sets must match exactly. Everything here is `spark.sql(...)`
  * over named views — copy-paste runnable from any SQL client bound
  * to the same session catalog. */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_lineitem")
    Tables.events(spark, sfDir).createOrReplaceTempView("g_events")
    Tables.documents(spark, sfDir).createOrReplaceTempView("g_documents")
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("g_embeddings")
    Tables.customer(spark, sfDir).createOrReplaceTempView("g_customer")
  }

  private def rows(df: DataFrame): Set[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
  }

  // (family, DataFrame-API result, the literal SQL a user would run)
  private lazy val surface: Seq[(String, DataFrame, String)] = Seq(
    ("relational/q06", Relational.selectiveSum(spark, sfDir),
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM g_lineitem
        |WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND l_shipdate < CAST('1997-01-01' AS TIMESTAMP)
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin),

    ("event/q12", Events.latestState(spark, sfDir),
      """SELECT user_id, e.event_id, e.event_type, e.value, e.ts
        |FROM (SELECT user_id, max_by(
        |    named_struct('event_id', event_id, 'event_type', event_type,
        |                 'value', value, 'ts', ts),
        |    named_struct('ts', ts, 'event_id', event_id)) AS e
        |  FROM g_events GROUP BY user_id)""".stripMargin),

    ("dedup/q20", Dedup.exact(spark, sfDir),
      """SELECT md5(CAST(text AS BINARY)) AS content_hash,
        |  min(doc_id) AS keep_id, count(1) AS n_dups
        |FROM g_documents GROUP BY 1""".stripMargin),

    ("ann/q75", Similarity.normStats(spark, sfDir),
      """WITH q AS (SELECT label,
        |  transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
        | FROM g_embeddings),
        |n AS (SELECT label,
        |  sqrt(CAST(aggregate(v, 0L, (acc, x) -> acc + x * x) AS DOUBLE))
        |    / 1e6 AS nrm FROM q)
        |SELECT label, count(1) AS n_vecs,
        |  round(avg(nrm), 4) AS avg_norm,
        |  round(min(nrm), 4) AS min_norm,
        |  round(max(nrm), 4) AS max_norm
        |FROM n GROUP BY label""".stripMargin),

    ("text/q27", TextAnalysis.tokenStats(spark, sfDir),
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(regexp_count(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]') AS BIGINT)
        |    AS n_re_tokens,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / size(split(text, ' ')) AS mean_tok_len
        |FROM g_documents""".stripMargin),

    ("sketch/q60", Sketch.countMinAudit(spark, sfDir), {
      def bucket(r: Int) =
        s"""CAST(conv(substring(md5(CAST(concat('cm$r|', tok) AS BINARY)),
           |  1, 8), 16, 10) AS BIGINT) % 256""".stripMargin
      val rb = (0 until 4).map(r =>
        s"named_struct('r', $r, 'b', ${bucket(r)})").mkString(",\n  ")
      s"""WITH tok AS (SELECT explode(split(text, ' ')) AS tok
         |  FROM g_documents),
         |hashed AS (SELECT tok, rb.r AS r, rb.b AS b
         |  FROM (SELECT tok, explode(array($rb)) AS rb FROM tok)),
         |sk AS (SELECT r, b, count(1) AS cnt FROM hashed GROUP BY r, b),
         |top AS (SELECT tok, count(1) AS n FROM tok GROUP BY tok
         |  ORDER BY n DESC, tok LIMIT 20),
         |tb AS (SELECT tok, n, rb.r AS r, rb.b AS b
         |  FROM (SELECT tok, n, explode(array($rb)) AS rb FROM top))
         |SELECT tb.tok AS token, tb.n AS n, min(sk.cnt) AS est
         |FROM tb JOIN sk ON tb.r = sk.r AND tb.b = sk.b
         |GROUP BY tb.tok, tb.n""".stripMargin
    }),

    ("linkage/q367", Dedup.fellegiSunter(spark, sfDir),
      """WITH p AS (SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |  a.c_nationkey AS nat1, b.c_nationkey AS nat2,
        |  a.c_mktsegment AS seg1, b.c_mktsegment AS seg2,
        |  CAST(round(a.c_acctbal * 100) AS BIGINT) AS bal1,
        |  CAST(round(b.c_acctbal * 100) AS BIGINT) AS bal2
        | FROM g_customer a JOIN g_customer b ON a.c_custkey < b.c_custkey
        | WHERE levenshtein(a.c_name, b.c_name) <= 1),
        |sc AS (SELECT id1, id2,
        |  nat1 = nat2 AS agree_nation, seg1 = seg2 AS agree_segment,
        |  abs(bal1 - bal2) <= 10000 AS agree_balance,
        |  CAST(9814
        |   + (CASE WHEN nat1 = nat2 THEN 4570 ELSE -4263 END)
        |   + (CASE WHEN seg1 = seg2 THEN 2170 ELSE -3000 END)
        |   + (CASE WHEN abs(bal1 - bal2) <= 10000 THEN 6322 ELSE -2307 END)
        |   AS BIGINT) AS score_cb
        | FROM p)
        |SELECT id1, id2, agree_nation, agree_segment, agree_balance,
        | score_cb,
        | CASE WHEN score_cb >= 18000 THEN 'match'
        |  WHEN score_cb >= 10000 THEN 'possible'
        |  ELSE 'nonmatch' END AS decision
        |FROM sc""".stripMargin),

    ("robust/q372", Sketch.winsorized(spark, sfDir),
      """WITH r AS (SELECT l_returnflag AS grp,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |  l_orderkey, l_linenumber FROM g_lineitem),
        |rk AS (SELECT grp, cents, row_number() OVER (PARTITION BY grp
        |   ORDER BY cents, l_orderkey, l_linenumber) AS rk,
        |  count(1) OVER (PARTITION BY grp) AS n FROM r),
        |b AS (SELECT grp,
        |  min(CASE WHEN rk = (n + 9) div 10 THEN cents END) AS p10,
        |  min(CASE WHEN rk = (9 * n + 9) div 10 THEN cents END) AS p90
        | FROM rk GROUP BY grp)
        |SELECT r.grp, count(1) AS n,
        | max(p10) AS p10_cents, max(p90) AS p90_cents,
        | sum(cents) div count(1) AS raw_mean_cents,
        | sum(greatest(p10, least(p90, cents))) div count(1)
        |   AS wins_mean_cents
        |FROM r JOIN b ON r.grp = b.grp GROUP BY r.grp""".stripMargin),

    // ---- round-14 broadening (VERDICT Next #8): five more
    // families, same discipline — the literal SQL is what a
    // migrating reference user would paste at a SQL prompt.

    ("pipeline/q46", Pipeline.sourceMix(spark, sfDir),
      """WITH per AS (SELECT source, count(1) AS n_docs,
        |  CAST(sum(size(split(text, ' '))) AS BIGINT) AS n_tokens
        | FROM g_documents GROUP BY source),
        |tot AS (SELECT sum(n_tokens) AS total_tokens,
        |  count(1) AS n_sources FROM per)
        |SELECT source, n_docs, n_tokens,
        | least(1.0, CAST(CAST(total_tokens * 0.5 AS BIGINT)
        |   div n_sources AS DOUBLE) / n_tokens) AS rate
        |FROM per CROSS JOIN tot""".stripMargin),

    ("sampling/q54", Sampling.hashSample(spark, sfDir),
      """SELECT doc_id, bucket FROM (
        | SELECT doc_id,
        |  CAST(conv(substring(md5(CAST(concat('sample|',
        |    CAST(doc_id AS STRING)) AS BINARY)), 1, 8), 16, 10)
        |   AS BIGINT) AS bucket
        | FROM g_documents)
        |WHERE bucket < 429496729""".stripMargin),

    ("window/q13", Events.tumblingCounts(spark, sfDir),
      """SELECT ts - ts % 3600000000 AS window_start, event_type,
        | count(1) AS n, round(sum(value), 2) AS sum_value
        |FROM g_events GROUP BY 1, 2""".stripMargin),

    ("privacy/q130", Privacy.kAnonymity(spark, sfDir),
      """WITH cls AS (SELECT c_mktsegment, c_nationkey, count(1) AS n
        |  FROM g_customer GROUP BY 1, 2)
        |SELECT c_mktsegment, count(1) AS n_classes,
        | sum(n) AS n_rows,
        | sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS n_risk_classes,
        | sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS n_risk_rows,
        | min(n) AS min_class_size,
        | round(CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
        |   / sum(n), 4) AS risk_row_frac
        |FROM cls GROUP BY c_mktsegment""".stripMargin),

    ("langid/q29", TextAnalysis.langId(spark, sfDir),
      """WITH sc AS (SELECT doc_id, lang,
        |  CAST(size(filter(split(text, ' '),
        |    x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS s_en,
        |  CAST(size(filter(split(text, ' '),
        |    x -> x IN ('der', 'die', 'das', 'und'))) AS BIGINT) AS s_de,
        |  CAST(size(filter(split(text, ' '),
        |    x -> x IN ('le', 'la', 'les', 'et'))) AS BIGINT) AS s_fr,
        |  CAST(size(filter(split(text, ' '),
        |    x -> x IN ('el', 'los', 'las', 'y'))) AS BIGINT) AS s_es
        | FROM g_documents)
        |SELECT *,
        | CAST(pred_lang = lang AS INT) AS is_correct
        |FROM (SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
        |    THEN 'en'
        |   WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |   WHEN s_fr >= s_es THEN 'fr'
        |   ELSE 'es' END AS pred_lang
        | FROM sc)""".stripMargin))

  test("every family's representative runs as literal SQL with identical rows") {
    registerViews()
    surface.foreach { case (family, df, sql) =>
      val apiRows = rows(df)
      val sqlRows = rows(spark.sql(sql))
      assert(apiRows.nonEmpty, s"$family: empty result invalidates the pin")
      assert(apiRows == sqlRows,
        s"$family: SQL surface diverged from the DataFrame plan " +
          s"(api ${apiRows.size} rows, sql ${sqlRows.size} rows; " +
          s"sample diff: ${(apiRows diff sqlRows).take(2)} vs " +
          s"${(sqlRows diff apiRows).take(2)})")
    }
  }
}
