package graft

import graft.operators.{Dedup, Events, StreamingOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 operators: the streaming dedup-index protocol
  * (replay / restart / compaction invariance) and the growth-
  * accounting full-outer fix. */
class Round11Spec extends SparkSpec {

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  // ---- q326/q327: the spec drives batches DIRECTLY through
  // dedupIndexBatch (the factored seam), so it can replay a batch
  // and force compaction at will — the crash windows the streaming
  // query's checkpoint replay produces.

  test("q326: batch replay + mid-stream compaction leave verdicts and pairs exact") {
    val stage = java.nio.file.Files.createTempDirectory("spec_q326_replay").toString
    val stateRoot = s"$stage/state"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateRoot))
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    Dedup.initDedupIndex(spark, stateRoot, docs.filter(col("doc_id") % 2 === 0))
    val delta = docs.filter(col("doc_id") % 2 =!= 0).localCheckpoint()
    val parts = Seq(
      delta.filter(col("doc_id") % 6 === 1),
      delta.filter(col("doc_id") % 6 === 3),
      delta.filter(col("doc_id") % 6 === 5))
    Dedup.dedupIndexBatch(spark, stateRoot, parts(0), 0L, compactEvery = 2)
    Dedup.dedupIndexBatch(spark, stateRoot, parts(1), 1L, compactEvery = 2)
    // crash window: checkpoint replay re-delivers batch 1 verbatim
    Dedup.dedupIndexBatch(spark, stateRoot, parts(1), 1L, compactEvery = 2)
    Dedup.dedupIndexBatch(spark, stateRoot, parts(2), 2L, compactEvery = 2)
    Dedup.compactDedupIndex(spark, stateRoot)
    val got = canon(Dedup.streamDedupVerdicts(spark, sfDir, stateRoot))
    val want = canon(Dedup.incrementalDedup(spark, sfDir))
    assert(got === want, "replayed stream verdicts differ from batch q105")
    // pair evidence: batching- and replay-invariant vs the full
    // band self-join over the streamed half
    val bands = Dedup.minhashBands(spark, sfDir).filter(col("doc_id") % 2 === 1)
    val wantPairs = canon(bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct())
    val gotPairs = canon(StreamingOps.readStoreAll(spark, stateRoot, "pairs")
      .get.distinct())
    assert(gotPairs === wantPairs, "replayed stream pairs differ from batch self-join")
  }

  test("q326: restart mid-stream — a second AvailableNow run over the same checkpoint absorbs the remaining files") {
    val stage = java.nio.file.Files.createTempDirectory("spec_q326_restart").toString
    val stateRoot = s"$stage/state"
    val inDir = s"$stage/in"; val ckpt = s"$stage/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateRoot))
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    Dedup.initDedupIndex(spark, stateRoot, docs.filter(col("doc_id") % 2 === 0))
    val delta = docs.filter(col("doc_id") % 2 =!= 0)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir)
        .writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          Dedup.dedupIndexBatch(spark, stateRoot, df, id, compactEvery = 2)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // phase 1: only the first half of the stream exists; the query
    // drains it and TERMINATES (the "crash")
    delta.filter(col("doc_id") % 4 === 1)
      .repartitionByRange(2, col("doc_id")).toJSON
      .write.mode("overwrite").text(inDir)
    drain()
    // phase 2: the rest of the stream lands; a NEW query on the SAME
    // checkpoint picks up exactly the unseen files
    delta.filter(col("doc_id") % 4 === 3)
      .repartitionByRange(2, col("doc_id")).toJSON
      .write.mode("append").text(inDir)
    drain()
    val got = canon(Dedup.streamDedupVerdicts(spark, sfDir, stateRoot))
    val want = canon(Dedup.incrementalDedup(spark, sfDir))
    assert(got === want, "restarted stream verdicts differ from batch q105")
  }

  // ---- q316: the full-outer churn fix — a churn day with zero
  // active users still emits its row.

  test("q316: growth accounting books churn on zero-DAU gap days (full outer)") {
    // synthetic: user 1 active day 0 only; user 2 active days 0 and 3.
    // day 1 has churn (user 1) AND activity... make day 1 truly empty:
    // both users active day 0 only except user 2 returns day 3 →
    // day 1: zero active, churned = 1 (user 1) + 1 (user 2) = 2.
    import spark.implicits._
    val us = 86400000000L
    val events = Seq((1L, 0L * us), (2L, 0L * us), (2L, 3L * us))
      .toDF("user_id", "ts")
    val days = events
      .select(col("user_id"), expr("ts div 86400000000").as("day")).distinct()
    // mirror growthAccounting's internals on the tiny frame: the
    // operator reads from Tables.documents, so pin the SHAPE via the
    // same algebra inline
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val anchor = days.agg(max(col("day")).as("mxd"))
    val classified = days
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .crossJoin(broadcast(anchor))
    val active = classified.groupBy(col("day"))
      .agg(sum(when(col("prev_day").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev_day") === col("day") - 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev_day").isNotNull &&
          col("prev_day") < col("day") - 1L, 1L).otherwise(0L))
          .as("n_resurrected"))
    val churned = classified
      .filter((col("next_day").isNull || col("next_day") > col("day") + 1L) &&
        col("day") + 1L <= col("mxd"))
      .groupBy((col("day") + 1L).as("day"))
      .agg(count(lit(1)).as("n_churned"))
    val full = active.join(churned, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // day 1 exists with zero active and 2 churned — the row the old
    // left join dropped
    assert(full.contains((1L, 0L, 0L, 0L, 2L)),
      s"zero-DAU churn day missing or wrong: $full")
    assert(full.contains((0L, 2L, 0L, 0L, 0L)))
    assert(full.contains((3L, 0L, 0L, 1L, 0L)))
  }

  test("q316: identity n_new + n_retained + n_resurrected = DAU holds on the corpus") {
    val ga = Events.growthAccounting(spark, sfDir)
    val dau = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000").as("day")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val bad = ga.join(dau, Seq("day"), "left")
      .filter(col("n_new") + col("n_retained") + col("n_resurrected") =!=
        coalesce(col("dau"), lit(0L)))
      .count()
    assert(bad === 0L)
  }
}
