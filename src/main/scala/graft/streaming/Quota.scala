package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key admission QUOTA (q221): admit at most `limit`
  * events per (user, hour), live — the rate-limiting/abuse-control
  * primitive a SEP-style event consumer runs in front of expensive
  * downstream work (enrichment, model scoring, human review).
  *
  * Which events are "admitted" must not depend on arrival order, or
  * the operator is not SQL-replayable (the house bar: Funnel /
  * RowMaterializer). So admission is NOT "first `limit` to ARRIVE"
  * but "the `limit` LOWEST WAL seqs" per key — and the state is a
  * k-min LATTICE: (total count, the ≤limit smallest seqs seen).
  * Merging any partition of the event multiset in any order yields
  * the same final state (min-k is commutative/associative/
  * idempotent on sets; permutation-fuzzed in QuotaSpec), so the
  * FINAL admitted set equals the batch `row_number() OVER
  * (PARTITION BY user, hour ORDER BY seq) <= limit` — the oracle.
  * Mid-stream emissions are provisional in exactly the watermark
  * sense: a late lower seq can evict a higher one from the admitted
  * set (both deliveries are flagged; the sink keeps the last).
  *
  * State per active key is O(limit); `n` assumes each seq is
  * delivered once — under an at-least-once WAL put
  * [[ExactlyOnce.dedupe]] in front (the q76/q86 contract). A
  * production deployment adds EventTimeTimeout so keys expire once
  * their hour passes the watermark (the Funnel.trackWithTTL
  * pattern); the gate runs NoTimeout to keep the final state
  * exactly the full-history answer. */
object Quota {

  case class QuotaEvent(user: Long, hour: Long, seq: Long)
  /** Running per-key state/emission: total seen + admitted seq set
    * (sorted ascending, ≤ limit entries). `n` is monotone per key,
    * so the emission with the largest n IS the final state — an
    * append sink collapses with max_by(n), no upsert needed. */
  case class QuotaRow(user: Long, hour: Long, n: Long, admitted: Seq[Long])

  /** Pure lattice merge — commutative, associative, idempotent on
    * the admitted set (QuotaSpec fuzzes permutations/splits). */
  def merge(st: QuotaRow, seqs: Seq[Long], limit: Int): QuotaRow =
    QuotaRow(st.user, st.hour, st.n + seqs.size,
      (st.admitted ++ seqs).distinct.sorted.take(limit))

  /** Streaming tracker over QuotaEvents; emits the current state of
    * every key touched in a batch (Update mode — last emission per
    * key is final). */
  def track(events: Dataset[QuotaEvent], limit: Int = 5): Dataset[QuotaRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user, e.hour))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (Long, Long), it: Iterator[QuotaEvent],
            state: GroupState[QuotaRow]) => {
          val st = state.getOption
            .getOrElse(QuotaRow(key._1, key._2, 0L, Nil))
          val next = merge(st, it.map(_.seq).toSeq, limit)
          state.update(next)
          Iterator(next)
        })
  }
}
