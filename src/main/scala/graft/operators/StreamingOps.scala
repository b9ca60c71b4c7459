package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.{Mutation, RowState}
import graft.sources.WalSource
import graft.streaming.RowMaterializer

/** Batch-replayable wrappers that put the STREAMING SEP core — DSv2
  * WAL source → stateful row materializer — under the driver's DuckDB
  * oracle gate (SURVEY §2.G was previously ScalaTest-only).
  */
object StreamingOps {

  /** q53: end-to-end streaming CDC materialization. Stages the events
    * table as JSONL WAL segments, consumes them through the custom
    * "graft-wal" MicroBatchStream with Trigger.AvailableNow (4
    * micro-batches of 2 segments — checkpointed, stateful,
    * admission-controlled), folds them in
    * [[RowMaterializer.materialize]], and emits each key's final row
    * state as scalar columns.
    *
    * Only put mutations are streamed: a row tombstone applies
    * unconditionally on arrival, so cross-micro-batch arrival order
    * would change its outcome — tombstone semantics are covered by
    * the q36 batch oracle and RowMaterializerSpec. For a put-only
    * stream the final state is arrival-order independent (puts are
    * guarded by the (ts, seq) high-water mark), which is what makes
    * this streaming query exactly SQL-replayable.
    */
  def walStreamMaterialize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // bounded staging: one fixed root per input dir, wiped at entry —
    // repeated bench warm-up/timed/verify runs reuse the same space
    // instead of accumulating a WAL copy per invocation
    val stagePath = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-q53-" + Integer.toHexString(dir.hashCode))
    if (java.nio.file.Files.exists(stagePath)) {
      java.nio.file.Files.walk(stagePath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val stage = stagePath.toString
    val walDir = s"$stage/wal"
    val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    val puts = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put")
    WalSource.writeWalJson(puts, walDir, batches = 8)
    finalStates(s, graft.sources.GraftWalStream(walDir, maxFilesPerTrigger = 2),
      out, ckpt)
  }

  /** q69: the SepModel subscription surface under the oracle gate —
    * four registered subscriptions fan out over the same WAL, each
    * seeing its filtered, cell-narrowed view; the audit row per
    * subscription (mutations, keys, surviving cells) is what a
    * SEP operator dashboard shows. */
  def subscriptionAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{Subscription, Subscriptions}
    val wal = WalSource.eventsAsWal(s, dir)
    val subs = Seq(
      Subscription("all"),
      Subscription("clicks", family = Some("e"), qualifier = Some("click")),
      Subscription("purchases", family = Some("e"), qualifier = Some("purchase")),
      Subscription("payloads", family = Some("e"), qualifier = Some("props")))
    Subscriptions.fanOut(wal, subs).toSeq.sortBy(_._1)
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_mutations"),
          countDistinct(col("rowkey")).as("n_keys"),
          sum(size(col("cells")).cast("long")).as("n_cells"))
          .select(lit(name).as("subscription"), col("n_mutations"),
            col("n_keys"), col("n_cells"))
      }.reduce(_ unionByName _)
  }

  /** q76: effectively-once replay audit — the WAL delivered twice
    * (at-least-once), deduplicated on the sequence number, must equal
    * single delivery. The batch form of streaming.ExactlyOnce's
    * contract, under the oracle gate. */
  def effectivelyOnce(s: SparkSession, dir: String): DataFrame = {
    val wal = WalSource.eventsAsWal(s, dir)
    wal.union(wal) // duplicate delivery
      .dropDuplicates("seq")
      .groupBy(col("table"))
      .agg(count(lit(1)).as("n_mutations"),
        countDistinct(col("rowkey")).as("n_keys"))
  }

  /** Run any [[graft.sources.WalStream]] transport to exhaustion
    * (Trigger.AvailableNow) through the stateful materializer and
    * return each key's FINAL row state as scalar columns. Update mode
    * emits a state row per touched key per micro-batch; the final
    * state is the row from the last batch touching the key.
    *
    * `rocksDB = true` runs the query on the RocksDB state-store
    * provider — the 100 TB production choice (state off-heap,
    * incremental checkpoints); results are provider-independent
    * (proven in WalStreamSpec). */
  def finalStates(s: SparkSession, wal: graft.sources.WalStream,
      out: String, ckpt: String, rocksDB: Boolean = false): DataFrame = {
    import s.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = s.conf.getOption(providerKey)
    if (rocksDB) s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val muts = wal.open(s).as[Mutation]
    val states = RowMaterializer.materialize(s, muts)
    val query = states.writeStream
      .foreachBatch { (df: Dataset[RowState], id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try query.awaitTermination()
    finally if (rocksDB) prior match {
      case Some(v) => s.conf.set(providerKey, v)
      case None => s.conf.unset(providerKey)
    }
    s.read.parquet(out)
      .groupBy(col("table"), col("rowkey"))
      .agg(max_by(struct(col("version"), col("deleted"), col("cells")),
        col("batch")).as("st"))
      .select(col("table"), col("rowkey"), col("st.version").as("version"),
        col("st.deleted").as("deleted"),
        array_join(array_sort(map_keys(col("st.cells"))), ",").as("qualifiers"))
  }
}
