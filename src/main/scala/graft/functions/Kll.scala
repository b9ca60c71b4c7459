package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable rank/quantile sketch in the KLL compactor-levels family
  * (Karnin–Lang–Liberty, FOCS'16), DETERMINISTIC variant (round-11,
  * VERDICT Next #5).
  *
  * Why it exists here: every exact quantile in this library rides
  * bounded-domain histograms (q97/q151/q164 — the right call when the
  * value domain is enumerable). A rank SKETCH covers the unbounded-
  * domain case: fixed-size state, one pass, mergeable across
  * partitions — the shape a 100 TB percentile needs when the domain
  * can't be gridded.
  *
  * Structure: level l holds a buffer of items each representing 2^l
  * input rows. Inserts land in level 0; when a buffer reaches `cap`
  * it COMPACTS — sort, keep the odd-indexed half with doubled weight,
  * spill to level l+1 (an odd leftover stays behind). Merge is
  * level-wise concatenation followed by the same compaction cascade.
  *
  * Error accounting is EXPLICIT, not probabilistic: the classic
  * randomized KLL flips a coin per compaction (even/odd offset) to
  * get ε ~ 1/k with high probability; coins would make the sketch
  * irreproducible across runs, so this variant always keeps the odd
  * positions and CARRIES ITS OWN WORST-CASE BOUND in the state —
  * replacing the pair (x₂ᵢ, x₂ᵢ₊₁), weight w each, by x₂ᵢ₊₁ at
  * weight 2w shifts any rank estimate by at most w (only queries
  * landing in one pair's gap move), so each compaction of level l
  * adds exactly 2^l to `err`, and for every query point
  * |sketchRank − trueRank| ≤ err. Σ over compactions gives
  * err ≤ n·⌈log₂(n/cap)⌉/cap — the deterministic ε ≈ log(n/k)/k
  * bound of the Manku-Rajagopalan-Lindsay lineage. The bound holds
  * for EVERY merge order (each compaction accounts for itself), so a
  * gate asserting "estimate within err of true rank" is
  * deterministic even though Spark merges partitions in arbitrary
  * order. Total weight is conserved exactly: Σ 2^l·|buf_l| = n.
  */
case class KllSketch(levels: Seq[Seq[Long]], err: Long, n: Long) {

  /** Sketch rank estimate: weighted count of items ≤ x. */
  def rank(x: Long): Long =
    levels.zipWithIndex.map { case (buf, l) =>
      buf.count(_ <= x).toLong << l
    }.sum

  /** Weight of the heaviest populated level — the estimator's
    * overshoot when it steps past the target rank. */
  def maxWeight: Long =
    levels.zipWithIndex.collect { case (buf, l) if buf.nonEmpty => 1L << l }
      .maxOption.getOrElse(1L)

  /** Smallest stored value whose cumulative weight reaches
    * ⌈q·n⌉ — the rank-selection estimate. */
  def quantile(q: Double): Long = {
    require(n > 0, "quantile of an empty sketch")
    val target = math.max(1L, math.ceil(q * n).toLong)
    val flat = levels.zipWithIndex
      .flatMap { case (buf, l) => buf.map(v => (v, 1L << l)) }
      .sortBy(_._1)
    var c = 0L
    flat.find { case (_, w) => c += w; c >= target }
      .map(_._1).getOrElse(flat.last._1)
  }
}

class KllAgg(cap: Int) extends Aggregator[Long, KllSketch, KllSketch] {
  require(cap >= 4 && cap % 2 == 0, "cap must be an even number >= 4")

  override def zero: KllSketch = KllSketch(Vector(Vector.empty), 0L, 0L)

  override def reduce(b: KllSketch, a: Long): KllSketch =
    compact(KllSketch(
      b.levels.updated(0, b.levels.head :+ a), b.err, b.n + 1))

  override def merge(x: KllSketch, y: KllSketch): KllSketch = {
    val depth = math.max(x.levels.length, y.levels.length)
    def lv(s: KllSketch, l: Int): Seq[Long] =
      if (l < s.levels.length) s.levels(l) else Vector.empty
    compact(KllSketch(
      Vector.tabulate(depth)(l => (lv(x, l) ++ lv(y, l)).toVector),
      x.err + y.err, x.n + y.n))
  }

  override def finish(b: KllSketch): KllSketch = b

  /** Cascade compaction: any buffer at/over capacity sorts, keeps
    * its odd-indexed half at doubled weight one level up, leaves an
    * odd straggler in place, and adds its weight to the carried
    * error bound. Deterministic — no coins. */
  private def compact(s: KllSketch): KllSketch = {
    var levels = s.levels.iterator.map(_.toVector).toVector
    var err = s.err
    var l = 0
    while (l < levels.length) {
      if (levels(l).size >= cap) {
        val sorted = levels(l).sorted
        val even = sorted.size - (sorted.size % 2)
        val keep = (1 until even by 2).map(sorted)
        val leftover =
          if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
        if (l + 1 >= levels.length) levels = levels :+ Vector.empty[Long]
        levels = levels
          .updated(l, leftover)
          .updated(l + 1, levels(l + 1) ++ keep)
        err += 1L << l
      }
      l += 1
    }
    KllSketch(levels, err, s.n)
  }

  override def bufferEncoder: Encoder[KllSketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllSketch]()
  override def outputEncoder: Encoder[KllSketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllSketch]()
}
