package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** WAL RETENTION / COMPACTION — the "run this forever" half of the
  * CDC story (round-7 VERDICT missing #4). The SEP-lineage file WAL
  * only ever grows; the reference family's operational answer is
  * HBase's: once every consumer has caught up past a point, snapshot
  * the materialized state at that RETENTION BOUNDARY and delete the
  * WAL files wholly below it (a WAL file is removable exactly when
  * its newest entry predates the flushed/replicated watermark).
  *
  * Contract (spec-pinned, WalRetentionSpec):
  *  - the snapshot holds each rowkey's LATEST mutation below the
  *    boundary — every other below-boundary mutation is dominated by
  *    it under latest-cell-wins, so state-as-of-T for ANY T ≥
  *    boundary over (snapshot ∪ surviving segments) equals the
  *    full-history answer: q71 time travel is PRESERVED at and above
  *    the boundary, forfeited below it (that is what retention
  *    means);
  *  - truncation is segment-granular: a segment is deleted iff its
  *    max ts < boundary (straddlers survive whole; their
  *    below-boundary rows are dominated by the snapshot, so the
  *    union never double-wins);
  *  - crash-ordering: the snapshot is published FIRST via the
  *    pointer-swap mechanism (ATOMIC_MOVE, the q140 pattern), then
  *    segments are deleted. A crash anywhere leaves extra dominated
  *    segments, never missing state;
  *  - compaction COMPOSES: a later boundary folds the previous
  *    snapshot with the WAL below the new boundary.
  *
  * At 100 TB: the snapshot write is one latest-wins aggregation over
  * (previous snapshot ∪ below-boundary WAL rows) — the q12 shape,
  * shuffled once on rowkey; segment stats come from per-file
  * min/max grouped on input_file_name (file-count-sized, the
  * metadata a real WAL keeps in its manifest); deletion is a
  * file-count-sized driver loop, not a data pass. */
object WalRetention {

  /** Stage the events table as a range-partitioned parquet WAL — one
    * mutation per event (seq = event_id, rowkey = user_id), `segments`
    * files ordered by seq, standing in for the shipped WAL segment
    * files a replication sink accumulates. */
  private[graft] def stageWal(s: SparkSession, dir: String, walDir: String,
      segments: Int = 8): Unit =
    Tables.events(s, dir)
      .select(col("event_id").as("seq"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      .repartitionByRange(segments, col("seq"))
      .write.mode("overwrite").parquet(walDir)

  /** Per-segment manifest: (file, min_ts, max_ts, n_rows) from one
    * pass grouped on input_file_name — the removability metadata. */
  private[graft] def segmentStats(s: SparkSession, walDir: String): DataFrame =
    s.read.parquet(walDir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        count(lit(1)).as("n_rows"))

  private def snapPointer(snapRoot: String) =
    java.nio.file.Paths.get(snapRoot, "snapshot.current")

  /** Live snapshot dir named by the pointer, if any. */
  private[graft] def currentSnapshot(snapRoot: String): Option[String] = {
    val ptr = snapPointer(snapRoot)
    if (java.nio.file.Files.exists(ptr))
      Some(java.nio.file.Paths.get(snapRoot,
        java.nio.file.Files.readString(ptr).trim).toString)
    else None
  }

  private def latestWins(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("seq"), col("ts"), col("event_type"), col("value")),
        struct(col("ts"), col("seq"))).as("m"))
      .select(col("user_id"), col("m.seq"), col("m.ts"),
        col("m.event_type"), col("m.value"))

  /** Snapshot state below `boundaryMicros` and truncate the WAL:
    * (1) publish snapshot' = latest-wins(previous snapshot ∪ WAL rows
    * with ts < boundary) to a fresh versioned dir + ATOMIC_MOVE
    * pointer swap (1 previous version retained as reader grace);
    * (2) delete every segment whose max ts < boundary. Returns
    * (segments deleted, segments kept). Idempotent: re-running at the
    * same boundary publishes an identical snapshot and finds nothing
    * left to delete. */
  def compact(s: SparkSession, walDir: String, snapRoot: String,
      boundaryMicros: Long): (Long, Long) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(snapRoot))
    val below = s.read.parquet(walDir)
      .filter(col("ts") < boundaryMicros)
      .select(col("seq"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val merged = currentSnapshot(snapRoot) match {
      case Some(prev) => s.read.parquet(prev).unionByName(below)
      case None => below
    }
    val version = currentSnapshot(snapRoot)
      .map(_.split("snapshot_v").last.toLong + 1).getOrElse(0L)
    val newDir = Paths.get(snapRoot, s"snapshot_v$version")
    latestWins(merged).write.mode("overwrite").parquet(newDir.toString)
    val tmp = Paths.get(snapRoot, s"snapshot.current.tmp$version")
    Files.writeString(tmp, s"snapshot_v$version")
    Files.move(tmp, snapPointer(snapRoot), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val listing = Files.list(Paths.get(snapRoot))
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.toList
        .filter(p => p.getFileName.toString.startsWith("snapshot_v") && p != newDir)
        .sortBy(_.getFileName.toString.stripPrefix("snapshot_v").toLong)
        .dropRight(1)
        .foreach { p =>
          Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.delete(f))
        }
    } finally listing.close()
    // truncate: a segment is removable iff every entry predates the
    // boundary — the snapshot published above now dominates it
    val stats = segmentStats(s, walDir).collect()
    val (dead, kept) = stats.partition(_.getAs[Long]("max_ts") < boundaryMicros)
    dead.foreach { r =>
      val p = Paths.get(java.net.URI.create(r.getAs[String]("file")).getPath)
      Files.deleteIfExists(p)
    }
    (dead.length.toLong, kept.length.toLong)
  }

  /** Materialized row state as of `asOfMicros` over (snapshot ∪
    * surviving WAL) — the q71 read path after compaction. Correct for
    * every asOf at or above the last compaction boundary; asOf below
    * the boundary answers from the snapshot floor (history below the
    * boundary is forfeited — that is the retention trade). */
  def stateAsOf(s: SparkSession, walDir: String, snapRoot: String,
      asOfMicros: Long = Long.MaxValue): DataFrame = {
    val wal = s.read.parquet(walDir)
      .select(col("seq"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val all = currentSnapshot(snapRoot) match {
      case Some(snap) => s.read.parquet(snap).unionByName(wal)
      case None => wal
    }
    latestWins(all.filter(col("ts") <= asOfMicros))
  }

  /** q212: the retention round-trip under the oracle gate — stage the
    * WAL, compact at the q126 cutoff (snapshot + truncate the
    * below-boundary segments), then materialize the latest row state
    * from (snapshot ∪ surviving segments). The oracle recomputes q12
    * latest-state from the RAW events table: the gate proves
    * truncation lost nothing the materialized view needs. */
  def walRetentionState(s: SparkSession, dir: String): DataFrame = {
    val stage = StreamingOps.stagingRoot("q212", dir)
    val walDir = s"$stage/wal"; val snapRoot = s"$stage/snap"
    stageWal(s, dir, walDir)
    compact(s, walDir, snapRoot, Incremental.DefaultCutoffMicros)
    stateAsOf(s, walDir, snapRoot)
      .select(col("user_id"), col("seq").as("event_id"), col("event_type"),
        col("value"), col("ts"))
  }
}
