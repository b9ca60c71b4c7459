package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (sketch family): engine-native HLL,
  * quantile, and count-min sketches validated against exact answers
  * within their error bounds. These are rows-only capabilities (no
  * cross-engine oracle — sketch internals differ per engine). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val docs = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = docs.distinct().count().toDouble
    val approx = docs.agg(approx_count_distinct(col("tok"), 0.02)).collect()
      .head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact median") {
    val o = Tables.orders(spark, sfDir)
    val approxMed = o.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))).collect()
      .head.getDouble(0)
    val sorted = o.select(col("o_totalprice")).orderBy(col("o_totalprice"))
      .collect().map(_.getDouble(0))
    val lo = sorted((sorted.length * 0.45).toInt)
    val hi = sorted((sorted.length * 0.55).toInt)
    assert(approxMed >= lo && approxMed <= hi, s"median approx $approxMed outside [$lo,$hi]")
  }

  test("count_min_sketch overestimates within bound") {
    val ev = Tables.events(spark, sfDir)
    val sketchBytes = ev.agg(
      count_min_sketch(col("event_type"), lit(0.01), lit(0.99), lit(42)))
      .collect().head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS never underestimates: $k est=$est exact=$n")
      assert(est <= n + (0.01 * ev.count()).toLong + 1, s"$k est=$est exact=$n over bound")
    }
  }

  test("q92 HLL registers merge losslessly across corpus splits") {
    // registers are a max-lattice: sketches built on disjoint halves
    // and merged with max-per-register must equal the whole-corpus
    // sketch — the property that lets 1000 executors sketch
    // independently and combine 256 longs each (SURVEY §6)
    import graft.operators.Sketch
    import org.apache.spark.sql.functions.max
    val keyed = Sketch.dauKeyed(spark, sfDir)
    val whole = Sketch.hllRegisters(keyed)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val half1 = Sketch.hllRegisters(keyed.filter(xxhash64(col("k")) % 2 === 0))
    val half2 = Sketch.hllRegisters(keyed.filter(xxhash64(col("k")) % 2 =!= 0))
    val merged = half1.union(half2)
      .groupBy(col("event_type"), col("reg"))
      .agg(max(col("mreg")).as("mreg"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole,
      s"merged registers diverge: ${merged.size} vs ${whole.size}")
  }

  test("q125 HLL pair unions dominate their sides and the I-E intersection tracks exact") {
    import graft.operators.Sketch
    val rows = Sketch.hllOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (estA, estB, estU) =
        (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
          r.getAs[Double]("est_union"))
      // register-wise max only raises registers, and the estimator is
      // monotone in them ⇒ union ≥ each side; subadditivity of the
      // max-merge ⇒ union ≤ sum (both would break if the pair union
      // ever merged the wrong registers)
      assert(estU >= math.max(estA, estB) - 1e-9 && estU <= estA + estB + 1e-9,
        s"${r.getAs[String]("source_a")}/${r.getAs[String]("source_b")}: " +
          s"union $estU outside [max($estA,$estB), $estA+$estB]")
      val rel = math.abs(r.getAs[Double]("est_intersect") -
        r.getAs[Long]("n_exact")) / r.getAs[Long]("n_exact").toDouble
      // observed ≤ 0.07 at m=256; 0.25 is the loose I-E variance bound
      assert(rel < 0.25, s"I-E intersection off by ${rel * 100}%")
    }
  }

  test("q136 per-column HLL distinct estimates stay within 10% of exact") {
    import graft.operators.Relational
    val rows = Relational.tableProfile(spark, sfDir).collect()
    assert(rows.length == 4)
    for (r <- rows)
      assert(r.getAs[Double]("rel_err") < 0.10,
        s"${r.getAs[String]("column")}: distinct estimate off by ${r.getAs[Double]("rel_err") * 100}%")
  }

  test("q132 coherent sampling: join of samples equals sample of the join") {
    // the identity that makes key-hash sampling unbiased for join
    // estimation: filtering BOTH sides by the same key bucket is the
    // same relation as filtering the full join's key afterwards
    import graft.operators.Sampling
    import graft.Tables
    def keep(key: org.apache.spark.sql.Column) =
      Sampling.hashBucket(concat(lit("cs|"), key.cast("string"))) % 16 === 0
    val joinOfSamples = Tables.orders(spark, sfDir)
      .filter(keep(col("o_orderkey"))).select(col("o_orderkey"))
      .join(Tables.lineitem(spark, sfDir).filter(keep(col("l_orderkey")))
        .select(col("l_orderkey"), col("l_linenumber")),
        col("o_orderkey") === col("l_orderkey"))
    val sampleOfJoin = Tables.orders(spark, sfDir).select(col("o_orderkey"))
      .join(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(keep(col("o_orderkey")))
    assert(joinOfSamples.except(sampleOfJoin).isEmpty &&
      sampleOfJoin.except(joinOfSamples).isEmpty,
      "key-hash sampling broke the join-sample identity")
    assert(joinOfSamples.count() > 0, "empty sample at sf0.001")
  }
}
