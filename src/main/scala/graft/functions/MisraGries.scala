package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters summary as a MERGEABLE typed
  * [[Aggregator]] — the sketch that replaces exact "group, count,
  * top-k" over a 100 TB token stream with O(k) state per partition
  * and a map-side-combinable merge (Misra & Gries 1982; mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS 2012 — both
  * published algorithms).
  *
  * Guarantee: after summarizing N items with capacity k, every item
  * whose true frequency exceeds N/(k+1) is present in the summary,
  * and each stored count underestimates the true count by at most
  * N/(k+1). Merging preserves the bound (decrements add). The
  * registered gate query `t_heavy_hitters` verifies the guarantee
  * per-corpus against exact counts at a threshold (N/64) far above
  * the capacity-256 error bound (N/257).
  *
  * Implementation note: the classic per-item all-counter decrement is
  * amortized away by letting the buffer grow to 2k and compacting by
  * subtracting the (k+1)-th largest count — same guarantee, O(log k)
  * amortized per item.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  private def compact(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count from everything; at most
      // k strictly-positive counters survive
      val d = m.valuesIterator.toArray.sortInPlace()(
        Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c > d => t -> (c - d) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], token: String)
      : Map[String, Long] = {
    val grown = m.updated(token, m.getOrElse(token, 0L) + 1L)
    if (grown.size >= 2 * k) compact(grown) else grown
  }

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] =
    compact(b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    })

  override def finish(m: Map[String, Long]): Map[String, Long] = compact(m)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Default capacity. Consumers gating on the N/(k+1) guarantee
    * (e.g. `t_heavy_hitters`) must derive their threshold from THIS
    * constant so sketch capacity and gate stay in lockstep. */
  val DefaultK = 256

  /** Column aggregate: misra_gries(tokens) → map<token, lower-bound
    * count> with at most `k` entries. */
  def misra_gries(c: Column, k: Int = DefaultK): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(c)
}
