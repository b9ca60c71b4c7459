package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MAX-VERSIONS materialization — HBase's VERSIONS=>k
  * retention (q262) maintained live per (rowkey, qualifier): the
  * state is the k largest cells by (ts, seq), a k-MAX LATTICE
  * (q221's k-min admitted-set idea upside down), so the final state
  * is ARRIVAL-ORDER INDEPENDENT — any permutation or micro-batch
  * slicing of the same cell multiset converges to the same k
  * newest versions (permutation-fuzzed in the spec), and replaying
  * a duplicate cell is a no-op (the distinct (ts, seq) identity) —
  * the at-least-once idempotency bar every state op here meets.
  * State per key is exactly ≤ k cells; memory is keys·k however
  * long the stream runs.
  */
object MaxVersions {

  case class Cell(user: String, qualifier: String, ts: Long, seq: Long,
      value_cents: Long)

  case class St(cells: List[(Long, Long, Long)]) // (ts, seq, cents)

  case class Out(user: String, qualifier: String, version: Long, ts: Long,
      value_cents: Long, seq: Long)

  /** k-max merge: distinct by (ts, seq), keep the k largest. */
  def merge(st: St, cells: Seq[Cell], k: Int): St = St(
    (st.cells ++ cells.map(c => (c.ts, c.seq, c.value_cents)))
      .distinctBy(c => (c._1, c._2))
      .sortBy(c => (-c._1, -c._2)).take(k))

  def rows(user: String, qualifier: String, st: St): Seq[Out] =
    st.cells.zipWithIndex.map { case ((ts, seq, cents), i) =>
      Out(user, qualifier, i + 1L, ts, cents, seq)
    }

  def track(s: SparkSession, cells: Dataset[Cell], k: Int): Dataset[Out] = {
    import s.implicits._
    cells.groupByKey(c => (c.user, c.qualifier))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (String, String), cs: Iterator[Cell], state: GroupState[St]) => {
          val st = merge(state.getOption.getOrElse(St(Nil)), cs.toSeq, k)
          state.update(st)
          rows(key._1, key._2, st).iterator
        })
  }
}
