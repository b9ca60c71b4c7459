package graft

import graft.operators.{Dedup, Relational, StreamingOps, TextAnalysis}
import graft.plans.PlanLint
import org.apache.spark.sql.functions._

/** Round-9 operators: semantics pins + plan-shape sweeps for
  * q275–q295. */
class Round9Spec extends SparkSpec {

  // ---- q275/q282: the BPE collapse fold ----

  /** Reference left-to-right greedy merge (the BPE definition). */
  private def ltrMerge(syms: List[String], l: String,
      r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r => (l + r) :: ltrMerge(rest, l, r)
    case a :: rest => a :: ltrMerge(rest, l, r)
    case Nil => Nil
  }

  test("q275: the aggregate fold equals left-to-right greedy merging") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val alphabet = Seq("a", "b", "ab", "c")
    val words = (1 to 200).map { _ =>
      (1 to (1 + rnd.nextInt(8))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).toList
    } :+ List("a") // 1-symbol word: no pairs, survives untouched
    for ((l, r) <- Seq(("a", "a"), ("a", "b"), ("ab", "c"), ("b", "a"))) {
      val df = words.toDF("syms")
        .crossJoin(broadcast(Seq((l, r)).toDF("l", "r")))
        .select(expr(
          """aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]),
            |(acc, x) -> if(element_at(acc, -1) = l AND x = r,
            |  concat(slice(acc, 1, size(acc) - 1), array(concat(l, r))),
            |  concat(acc, array(x))))""".stripMargin).as("merged"))
        .as[List[String]].collect()
      for ((w, got) <- words.zip(df))
        assert(got === ltrMerge(w, l, r), s"pair ($l,$r) word $w")
    }
  }

  test("q275: rules are deterministic and rounds strictly learn") {
    val rules = TextAnalysis.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rules.length === 3)
    // re-running yields the identical rules (determinism)
    val again = TextAnalysis.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rules.toSeq === again.toSeq)
    // the same (l, r) pair is never learned twice: its occurrences
    // were collapsed away before the next round counted
    assert(rules.map(t => (t._2, t._3)).distinct.length === 3)
  }

  test("q282: BPE apply only ever shrinks, and exactly by merge count") {
    val rows = TextAnalysis.bpeApply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val before = r.getAs[Long]("n_tokens_char")
      val after = r.getAs[Long]("n_tokens_bpe")
      assert(after <= before, s"lang ${r.getString(0)} grew")
      assert(after >= 1L)
      assert(r.getAs[Long]("saved_ppm") ===
        (before - after) * 1000000L / before)
    }
  }

  // ---- q281: label propagation ----

  test("q281: LPA separates two cliques joined by a bridge") {
    import spark.implicits._
    // two triangles {1,2,3} and {10,11,12} plus a single bridge 3-10:
    // 3 rounds of majority/min-label must settle both triangles on
    // their own min label; the bridge edge must not merge them
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("d1", "d2")
    val hist = Dedup.labelPropagationOf(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sizes: two communities of 3 (bridge endpoints stay with their
    // triangle: 2 triangle neighbors beat 1 bridge neighbor)
    assert(hist === Map(3L -> 2L))
  }

  test("q281: edge-order permutation invariance") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = (1 to 30).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val a = Dedup.labelPropagationOf(base.toDF("d1", "d2"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.labelPropagationOf(
      rnd.shuffle(base).reverse.toDF("d1", "d2"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  // ---- q283: the bit-or lattice ----

  test("q283: duplicate WAL delivery cannot change the retention grid") {
    import graft.operators.Events
    // bit_or + min absorb replays: the grid over (events ++ events)
    // equals the grid over events — the lattice argument the
    // streaming gate relies on, checked end-to-end in batch form
    val once = Events.bitmaskRetention(spark, sfDir).collect()
      .map(_.toSeq).toSet
    val ev = Tables.events(spark, sfDir)
    val d0 = ev.agg(min(expr("ts div 86400000000"))).head().getLong(0)
    val doubled = ev.unionAll(ev)
      .select(col("user_id"), (expr("ts div 86400000000") - lit(d0)).as("d"))
      .filter(col("d") < 63)
      .groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort"),
        expr("bit_or(shiftleft(cast(1 as bigint), cast(d as int)))").as("mask"))
    val twice = Events.retentionGrid(doubled, 7).collect().map(_.toSeq).toSet
    assert(once === twice)
  }

  // ---- q276–q283: plan-shape sweep ----

  // ---- q285: removal monotonicity ----

  test("q285: every removal effect is non-negative and baseline-bounded") {
    import graft.operators.Events
    for (r <- Events.markovRemoval(spark, sfDir).collect()) {
      val base = r.getAs[Long]("base_ppm")
      val rem = r.getAs[Long]("removed_ppm")
      assert(rem <= base,
        s"${r.getString(0)}: removal increased conversion ($rem > $base)")
      assert(r.getAs[Long]("effect_ppm") >= 0L)
      assert(rem >= 0L && base <= 1000000L)
    }
  }

  // ---- q286: the KMin lattice ----

  test("q286: KMinAgg is a set lattice (dup/order/merge invariant)") {
    val agg = new graft.functions.KMinAgg(4)
    val rnd = new scala.util.Random(21)
    val vals = Seq.fill(50)(rnd.nextInt(30).toLong)
    val expected = vals.distinct.sorted.take(4)
    // any fold order, with duplicates, lands on the same buffer
    for (_ <- 1 to 10) {
      val shuffled = rnd.shuffle(vals)
      val folded = shuffled.foldLeft(agg.zero)(agg.reduce)
      assert(folded === expected)
      // arbitrary split + merge
      val (a, b) = shuffled.splitAt(rnd.nextInt(vals.length))
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged === expected)
      // idempotent: merging a buffer with itself changes nothing
      assert(agg.merge(folded, folded) === expected)
    }
  }

  // ---- q290: skyline semantics ----

  test("q290: frontier members are mutually non-dominated and complete") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        expr("cast(round(p_retailprice * 100) as bigint)").as("pc"),
        col("p_size").cast("long").as("sz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(p: (Long, Long, Long)) = parts.exists(q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    val expected = parts.filterNot(dominated).map(_._1).toSet
    val got = Relational.paretoFrontier(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  // ---- q289: retraction algebra ----

  test("q289: retracting everything re-inserted is the identity") {
    import graft.operators.Incremental
    // inserts(X) then retract(X) must leave the snapshot unchanged
    val snap = Incremental.partialAgg(
      Tables.events(spark, sfDir)).collect().map(_.toSeq).toSet
    val all = Tables.events(spark, sfDir)
    val doubled = Incremental.partialAgg(all).unionByName(
      all.withColumn("mult", lit(1L))
        .unionByName(all.withColumn("mult", lit(-1L)))
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("mult")).as("n_events"),
          sum(col("mult") * round(col("value") * 100).cast("long"))
            .as("sum_cents")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_cents")).as("sum_cents"))
      .filter(col("n_events") > 0L)
      .collect().map(_.toSeq).toSet
    assert(doubled === snap)
  }

  // ---- q291/q292: the two-phase prefix-sum invariants ----

  test("q291: shards partition the corpus and offsets are consistent") {
    val rows = graft.operators.Multimodal.mediaShardPack(spark, sfDir)
      .collect()
    val totalBytes = Tables.documents(spark, sfDir)
      .agg(sum(length(col("text")).cast("long"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("bytes")).sum === totalBytes,
      "packed bytes must conserve the corpus")
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_blobs")).sum === nDocs)
    // start-offset cut rule: every shard id is within the byte span
    val maxShard = rows.map(_.getAs[Long]("shard_id")).max
    assert(maxShard <= totalBytes / 16384L)
  }

  test("q292: peak concurrency equals the brute-force sweep") {
    import graft.operators.Events
    val got = Events.maxConcurrency(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force on the collected session set (sf0.001: small)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(spark, sfDir)
      .withColumn("p", lag(col("ts"), 1).over(w))
      .withColumn("n", when(col("p").isNull ||
        col("ts") - col("p") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("n")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("a"), (max(col("ts")) + 1L).as("b"))
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val deltas = (sess.map(s => (s._1, 1)) ++ sess.map(s => (s._2, -1)))
      .sortBy(d => (d._1, d._2))
    var c = 0L
    val best = scala.collection.mutable.Map.empty[Long, Long]
    for ((t, d) <- deltas) {
      c += d
      val day = t / 86400000000L
      if (c > best.getOrElse(day, Long.MinValue)) best(day) = c
    }
    assert(got === best.toMap)
  }

  test("round-9 operators: no cartesians, no low-cardinality windows") {
    import graft.operators.{Eval, Events}
    for ((name, df) <- Seq(
        "q275" -> TextAnalysis.bpeTrain(spark, sfDir),
        "q276" -> Relational.smallQtyRevenue(spark, sfDir),
        "q277" -> Relational.waitingSuppliers(spark, sfDir),
        "q278" -> Relational.dormantHighBalance(spark, sfDir),
        "q279" -> Relational.promoShare(spark, sfDir),
        "q280" -> Relational.marketLeader(spark, sfDir),
        "q281" -> Dedup.labelPropagation(spark, sfDir),
        "q284" -> Eval.ksDrift(spark, sfDir),
        "q285" -> Events.markovRemoval(spark, sfDir),
        "q287" -> Eval.decileLift(spark, sfDir),
        "q288" -> graft.operators.Similarity.annFiltered(spark, sfDir),
        "q289" -> graft.operators.Incremental.ivmRetract(spark, sfDir),
        "q290" -> Relational.paretoFrontier(spark, sfDir),
        "q291" -> graft.operators.Multimodal.mediaShardPack(spark, sfDir),
        "q292" -> Events.maxConcurrency(spark, sfDir),
        "q293" -> Relational.disjunctiveRevenue(spark, sfDir),
        "q295" -> Relational.contributionDecomposition(spark, sfDir),
        "q296" -> Events.crosstabIndependence(spark, sfDir),
        "q282" -> TextAnalysis.bpeApply(spark, sfDir))) {
      val rules = PlanLint.audit(df).map(_.rule).toSet
      assert(!rules.contains("cartesian-product"), s"$name cartesian")
      assert(!rules.contains("low-cardinality-partition-window"),
        s"$name low-card window")
    }
  }
}
