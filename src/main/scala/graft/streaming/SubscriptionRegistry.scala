package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Persistent subscription registry — the SepModel equivalent
  * (register/unregister/list replication subscriptions; the reference
  * keeps these in ZooKeeper, here a JSON file works for single-driver
  * deployments and swaps for any shared KV store in production).
  *
  * Each registered subscription can be attached to the WAL stream as
  * its own filtered view; Spark checkpoints track each attached
  * query's offsets independently — the per-subscription progress
  * tracking of the reference.
  */
final class SubscriptionRegistry(path: String) {

  private val mapper = new ObjectMapper()
  // in-process mutation lock keyed by the registry PATH (two
  // instances over the same file must serialize); cross-process
  // safety comes from the atomic rename below (readers always see a
  // complete file — multi-writer across processes needs a real
  // coordination service, as the reference's ZK registry provides)
  private val lock = SubscriptionRegistry.lockFor(path)

  private def write(subs: Seq[Subscription]): Unit = {
    val lines = subs.map { s =>
      val n = mapper.createObjectNode()
      n.put("name", s.name)
      s.table.foreach(n.put("table", _))
      s.family.foreach(n.put("family", _))
      s.qualifier.foreach(n.put("qualifier", _))
      mapper.writeValueAsString(n)
    }
    val target = Paths.get(path).toAbsolutePath
    // pid + thread + random suffix: two processes can share a thread
    // id, and one process's ATOMIC_MOVE must never publish another's
    // half-written tmp file
    val tmp = target.resolveSibling(
      s".${target.getFileName}.${ProcessHandle.current().pid()}." +
        s"${Thread.currentThread().getId}." +
        s"${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    // write-temp-then-rename: a crash mid-write can never leave a
    // truncated or corrupt registry behind
    Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Registered subscriptions (empty when the registry is new). */
  def list(): Seq[Subscription] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      def opt(f: String) = if (n.hasNonNull(f)) Some(n.get(f).asText()) else None
      Subscription(n.get("name").asText(), opt("table"), opt("family"), opt("qualifier"))
    }
  }

  /** Register (upsert by name) — SepModel.addSubscription. */
  def add(sub: Subscription): Unit = lock.synchronized {
    write(list().filterNot(_.name == sub.name) :+ sub)
  }

  /** Unregister — SepModel.removeSubscription. */
  def remove(name: String): Unit = lock.synchronized {
    write(list().filterNot(_.name == name))
  }

  def hasSubscription(name: String): Boolean = list().exists(_.name == name)

  // ---- consumer progress (the reference tracks per-subscription
  // replication positions in ZK; here ONE FILE PER SUBSCRIPTION in a
  // sibling directory, each written with the crash-atomic
  // write-temp-then-rename discipline). Per-subscription files make
  // concurrent consumer PROCESSES safe: two registries acking
  // DIFFERENT subscriptions touch different files, so neither can
  // lose the other's position (the round-9 whole-file
  // read-modify-write could last-writer-win the full map away).
  // Same-subscription multi-writer is serialized by a per-sub OS
  // FileLock inside [[ack]], so the monotonic invariant holds
  // cross-process too. O(1) per ack, not O(|subs|). ----

  private def acksDir = Paths.get(s"$path.acks.d")
  // legacy round-9 combined file — still read (max-merged) so
  // registries written before the per-sub layout keep their positions
  private def legacyAcksPath = Paths.get(s"$path.acks")

  private def ackFile(name: String): java.nio.file.Path =
    acksDir.resolve(
      java.net.URLEncoder.encode(name, java.nio.charset.StandardCharsets.UTF_8)
        + ".ack")

  /** Record that `name` has consumed the WAL through `seq`.
    * MONOTONIC — including ACROSS PROCESSES: the read-check-write is
    * guarded by an OS [[java.nio.channels.FileLock]] on a per-
    * subscription sibling lock file (the in-process `lock` alone
    * would let two registry PROCESSES interleave read(5) / write(11)
    * / write(10) and move the persisted position backward), so the
    * stored position only moves forward no matter how many registries
    * share the file. An at-least-once replay after a crash (the same
    * batch acked twice, or an older batch re-delivered) can never
    * move a consumer backwards — ack is idempotent and
    * order-tolerant, the same lattice discipline as every other
    * state in this library. The lock file is tiny, per-subscription
    * (no cross-consumer contention), and held only for the
    * read-compare-rename window. */
  def ack(name: String, seq: Long): Unit = lock.synchronized {
    Files.createDirectories(acksDir)
    val target = ackFile(name).toAbsolutePath
    val lockPath = target.resolveSibling(s"${target.getFileName}.lock")
    val ch = java.nio.channels.FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      // blocks until any other PROCESS releases. Same-JVM collisions
      // (FileLock throws OverlappingFileLockException instead of
      // blocking) are normally excluded by the canonicalized
      // per-path mutex in lockFor, but two path strings can still
      // reach one underlying file (symlinks survive normalize) — so
      // retry-with-backoff rather than surface a spurious throw
      def acquire(): java.nio.channels.FileLock = {
        var attempt = 0
        var fl: java.nio.channels.FileLock = null
        while (fl == null) {
          try fl = ch.lock()
          catch {
            case _: java.nio.channels.OverlappingFileLockException
                if attempt < 600 =>
              attempt += 1; Thread.sleep(10)
          }
        }
        fl
      }
      val fl = acquire()
      try {
        // re-read INSIDE the lock: the check and the rename are now
        // one atomic step w.r.t. every other locker
        if (ackedSeq(name).getOrElse(Long.MinValue) < seq) {
          val node = mapper.createObjectNode()
          node.put("name", name); node.put("seq", seq)
          val tmp = target.resolveSibling(
            s".${target.getFileName}.${ProcessHandle.current().pid()}." +
              s"${Thread.currentThread().getId}." +
              s"${java.util.UUID.randomUUID().toString.take(8)}.tmp")
          Files.write(tmp, Seq(mapper.writeValueAsString(node)).asJava,
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
          Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      } finally fl.release()
    } finally ch.close()
  }

  /** The acked WAL position of every consumer that has ever acked —
    * the max-merge of every per-subscription file plus the legacy
    * combined file (monotonic: max is the only safe merge). */
  def acks(): Map[String, Long] = {
    def parse(lines: Seq[String]): Seq[(String, Long)] =
      lines.filter(_.nonEmpty).map { line =>
        val n = mapper.readTree(line)
        n.get("name").asText() -> n.get("seq").asLong()
      }
    val legacy =
      if (Files.exists(legacyAcksPath))
        parse(Files.readAllLines(legacyAcksPath).asScala.toSeq)
      else Seq.empty
    val perSub =
      if (!Files.isDirectory(acksDir)) Seq.empty
      else {
        val listing = Files.list(acksDir)
        try listing.iterator().asScala.toList
          .filter(_.getFileName.toString.endsWith(".ack"))
          .flatMap(p => parse(Files.readAllLines(p).asScala.toSeq))
        finally listing.close()
      }
    (legacy ++ perSub).groupMapReduce(_._1)(_._2)(math.max)
  }

  /** `name`'s acked position, if it has ever acked. */
  def ackedSeq(name: String): Option[Long] = {
    val own = ackFile(name)
    val fromFile =
      if (Files.exists(own)) {
        Files.readAllLines(own).asScala.find(_.nonEmpty)
          .map(line => mapper.readTree(line).get("seq").asLong())
      } else None
    val fromLegacy =
      if (Files.exists(legacyAcksPath))
        Files.readAllLines(legacyAcksPath).asScala.filter(_.nonEmpty)
          .map(mapper.readTree)
          .find(_.get("name").asText() == name)
          .map(_.get("seq").asLong())
      else None
    (fromFile.toSeq ++ fromLegacy.toSeq).maxOption
  }

  /** Attach every registered subscription to a WAL stream. */
  def attachAll(wal: DataFrame): Map[String, DataFrame] =
    Subscriptions.fanOut(wal, list())
}

object SubscriptionRegistry {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    locks.computeIfAbsent(
      Paths.get(path).toAbsolutePath.normalize.toString, _ => new Object)
}
