package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The 100×-scale knobs of the embedding candidate generators
  * (SURVEY §6): q24's nBands/bandBits banding and q99's subBits
  * quantizer split. These pin the REFINEMENT properties that make
  * the knobs safe to raise at scale: turning the knob only removes
  * candidates (never silently changes what a candidate means), the
  * keyspace actually grows, and every emitted pair still passes the
  * exact-cosine verify.
  */
class SimilarityScaleSpec extends SparkSpec {

  test("q24 banding: bandBits refines — (4×4) pairs are a subset of the (8×2) default and candidates shrink") {
    // same 16 planes, regrouped: (4 bands × 4 bits) collides iff both
    // covering (8 × 2) bands collide, so candidates strictly refine
    val q = Similarity.quantized(spark, sfDir).cache()
    try {
      val candDefault = Similarity.embedCandidatesOf(q, 64, 8, 2)
      val candWide    = Similarity.embedCandidatesOf(q, 64, 4, 4)
      val nDefault = candDefault.count()
      val nWide    = candWide.count()
      assert(nWide <= nDefault,
        s"(4x4) candidates ($nWide) exceed (8x2) candidates ($nDefault)")
      assert(candWide.except(candDefault).count() == 0,
        "(4x4) produced a candidate pair the (8x2) banding does not contain")

      // verified pairs follow the same subset relation
      val pDefault = Similarity.embedNearDup(spark, sfDir)
        .select("id1", "id2")
      val pWide = Similarity.embedNearDup(spark, sfDir, 64, 4, 4)
        .select("id1", "id2")
      assert(pWide.except(pDefault).count() == 0,
        "(4x4) verified pairs are not a subset of the (8x2) default")
    } finally q.unpersist()
  }

  test("q24 banding: band_key keyspace is 2^bandBits and wider keys are exercised") {
    val q = Similarity.quantized(spark, sfDir)
    val keys = Similarity.embedBandsOf(q, 64, 4, 4)
      .agg(min(col("band_key")).as("lo"), max(col("band_key")).as("hi"))
      .head()
    assert(keys.getLong(0) >= 0L && keys.getLong(1) < 16L,
      s"band_key out of [0, 2^4): ${keys}")
    assert(keys.getLong(1) >= 4L,
      "no band_key used the extra bits — 4-bit banding degenerated to 2-bit")
  }

  test("q24: every pair emitted under non-default banding passes the exact cosine threshold") {
    val pairs = Similarity.embedNearDup(spark, sfDir, 64, 4, 4).collect()
    assert(pairs.nonEmpty, "non-default banding found no pairs at sf0.001")
    assert(pairs.forall(_.getDouble(2) >= 0.4))
  }

  test("q99 quantizer: subBits refines the label cell (cell >> subBits == label) and grows the keyspace") {
    val docs = Similarity.ivfSelfJoin(spark, sfDir, 0.4, 2)
    // refinement invariant checked via the pair list's cell column:
    // sub-cell id div 4 must be a valid label cell (0..9)
    val cells = docs.select(col("cell")).distinct().collect().map(_.getLong(0))
    assert(cells.forall(c => (c >> 2) >= 0 && (c >> 2) < 10),
      s"sub-cell ids do not refine labels: ${cells.mkString(",")}")
  }

  test("q99 quantizer: subBits pairs are a subset of the label-cell pairs and candidate volume shrinks") {
    val p0 = Similarity.ivfSelfJoin(spark, sfDir).select("id1", "id2")
    val p2 = Similarity.ivfSelfJoin(spark, sfDir, 0.4, 2).select("id1", "id2")
    assert(p2.except(p0).count() == 0,
      "subBits=2 emitted a pair the label quantizer does not contain")
    // candidate volume = sum of cell_size^2 over cells — the quantity
    // the knob exists to bound; splitting must reduce it
    def volume(subBits: Int): Long = {
      val (_, assigned) = Similarity.ivfAssigned(spark, sfDir, subBits)
      assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n"))).head().getLong(0)
    }
    val v0 = volume(0)
    val v2 = volume(2)
    assert(v2 < v0, s"subBits=2 did not reduce candidate volume ($v2 >= $v0)")
  }

  test("q113 banding: bandChars refines — 4-char-band pairs are a subset of the 2-char default") {
    import graft.operators.Multimodal
    val p2 = Multimodal.phashNearDup(spark, sfDir).select("id1", "id2")
    val p4 = Multimodal.phashNearDup(spark, sfDir, 8, 4).select("id1", "id2")
    assert(p4.except(p2).count() == 0,
      "bandChars=4 emitted a pair the 2-char banding does not contain")
    assert(p4.count() > 0, "bandChars=4 found no pairs at sf0.001")
  }

  test("q124 SQ8: deeper re-rank lists are monotone — top-1 exact cosine never drops as m grows") {
    def top1(m: Int): Map[Long, Double] =
      Similarity.sq8Rerank(spark, sfDir, m = m).filter(col("rank") === 1)
        .select("query_id", "cosine").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shallow = top1(3)
    val deep = top1(50)
    assert(shallow.keySet == deep.keySet)
    for ((q, c) <- shallow)
      assert(deep(q) >= c,
        s"query $q: m=50 top-1 cosine ${deep(q)} < m=3 top-1 $c — deeper candidates lost a neighbor")
  }

  test("q124 SQ8: int8 quantization gap on surviving neighbors stays small") {
    val maxGap = Similarity.sq8Rerank(spark, sfDir)
      .agg(max(abs(col("cosine") - col("approx_cosine")))).head.getDouble(0)
    // observed ≤ 0.007 on the 64-dim unit-ish corpus; 0.02 leaves
    // slack without letting a broken code path (e.g. truncation
    // instead of rounding) slip through
    assert(maxGap < 0.02, s"SQ8 approx diverges from exact cosine by $maxGap")
  }
}
