package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored id: the (similarity, neighbor) pair the top-k aggregators
  * rank. Ordering: score DESC, then id ASC — the same deterministic
  * tie-break the window-based top-k queries use.
  */
case class ScoredId(score: Double, id: Long)

/** Typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §7.4): exact top-k by
  * score with a BOUNDED buffer — each partial holds at most k elements,
  * so the shuffle carries O(k) per group instead of the full candidate
  * list that a window-based top-k sorts. This is the aggregation-pushdown
  * form of "ORDER BY score LIMIT k per key": at 100 TB the partial
  * aggregation runs map-side and only k·groups rows cross the wire.
  *
  * The reference's nearest analogue is its bounded per-ref version
  * history (MAX_HISTORY=16, /root/reference/src/opusdb/atomic/stm.clj:10,
  * 42-53): state capped at k, older/lower entries evicted on insert.
  */
case class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[Long]] {

  private def ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(reduction: Seq[ScoredId]): Seq[Long] =
    reduction.map(_.id)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
