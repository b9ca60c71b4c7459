package graft

import org.apache.spark.sql.functions._

/** Round-13 operators: ExactSubstr maximal-span semantics (the
  * constructed 2k-block case and the q375 reconciliation the round
  * verdict prescribed). */
class Round13Spec extends SparkSpec {

  test("q384: two docs sharing a 2k-token block cut exactly ONE span") {
    import spark.implicits._
    val k = 5
    // doc 1 owns the block; doc 2 embeds the same 2k tokens between
    // unique prefix/suffix tokens — ExactSubstr must merge the k+1
    // overlapping duplicated k-gram anchors into ONE maximal span of
    // exactly 2k cut tokens in doc 2 and cut NOTHING in doc 1
    val block = (0 until 2 * k).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 $block u3"),
      (2L, s"v1 v2 v3 $block v4 v5")).toDF("doc_id", "text")
    val r = graft.operators.Dedup.exactSubstrOf(docs, k)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_cut_spans") === 0L, "owner keeps all")
    assert(r(1L).getAs[Long]("n_cut_tokens") === 0L)
    assert(r(2L).getAs[Long]("n_cut_spans") === 1L,
      "a shared 2k block must merge into one maximal span")
    assert(r(2L).getAs[Long]("n_cut_tokens") === (2 * k).toLong)
    assert(r(2L).getAs[Long]("n_cut_occ") === (k + 1).toLong,
      "2k-token block holds k+1 overlapping k-gram anchors")
  }

  test("q384: disjoint shared blocks stay separate maximal spans") {
    import spark.implicits._
    val k = 3
    val a = "x1 x2 x3"
    val b = "y1 y2 y3"
    val docs = Seq(
      (1L, s"$a p1 p2 $b"),
      (2L, s"q1 $a q2 q3 q4 $b q5")).toDF("doc_id", "text")
    val r = graft.operators.Dedup.exactSubstrOf(docs, k)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(2L).getAs[Long]("n_cut_spans") === 2L)
    assert(r(2L).getAs[Long]("n_cut_tokens") === 6L)
  }

  test("q384 at k=3 reconciles with q375: cut occurrences = n_removed") {
    // same grain, same min-doc owner rule => the anchor-occurrence
    // accounting must agree doc by doc on the real corpus
    val es = graft.operators.Dedup.exactSubstr(spark, sfDir, k = 3)
      .select(col("doc_id"), col("n_cut_occ"))
    val sd = graft.operators.Dedup.spanDedup(spark, sfDir)
      .select(col("doc_id"), col("n_removed"))
    val joined = es.join(sd, "doc_id").collect()
    assert(joined.nonEmpty)
    for (row <- joined)
      assert(row.getAs[Long]("n_cut_occ") === row.getAs[Long]("n_removed"),
        s"doc ${row.getAs[Long]("doc_id")} diverges from q375")
  }
}
