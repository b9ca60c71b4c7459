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
  // replication positions in ZK; here a sibling acks file with the
  // same crash-atomic write-temp-then-rename discipline) ----

  private def acksPath = s"$path.acks"

  /** Record that `name` has consumed the WAL through `seq`.
    * MONOTONIC: the stored position only moves forward, so an
    * at-least-once replay after a crash (the same batch acked twice,
    * or an older batch re-delivered) can never move a consumer
    * backwards — ack is idempotent and order-tolerant, the same
    * lattice discipline as every other state in this library. */
  def ack(name: String, seq: Long): Unit = lock.synchronized {
    val cur = acks()
    if (cur.getOrElse(name, Long.MinValue) < seq)
      writeAcks(cur + (name -> seq))
  }

  /** The acked WAL position of every consumer that has ever acked. */
  def acks(): Map[String, Long] = {
    val p = Paths.get(acksPath)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      n.get("name").asText() -> n.get("seq").asLong()
    }.toMap
  }

  /** `name`'s acked position, if it has ever acked. */
  def ackedSeq(name: String): Option[Long] = acks().get(name)

  private def writeAcks(m: Map[String, Long]): Unit = {
    val lines = m.toSeq.sortBy(_._1).map { case (n, q) =>
      val node = mapper.createObjectNode()
      node.put("name", n); node.put("seq", q)
      mapper.writeValueAsString(node)
    }
    val target = Paths.get(acksPath).toAbsolutePath
    val tmp = target.resolveSibling(
      s".${target.getFileName}.${ProcessHandle.current().pid()}." +
        s"${Thread.currentThread().getId}." +
        s"${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
