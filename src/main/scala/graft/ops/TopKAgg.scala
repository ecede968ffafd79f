package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed bounded top-k aggregator (SURVEY.md §2.7's UDAF surface,
  * `Aggregator[IN, BUF, OUT]`). The window route to per-group top-k
  * (`row_number <= k`) must ship every candidate row of a group to one
  * task before ranking; this aggregator's partial buffers are BOUNDED
  * at k entries, so map-side combine truncates before the exchange and
  * each group ships at most k·numPartitions entries regardless of
  * group size — the shape that survives a billion-row hot group.
  * TopKAggSpec proves result equality with the window implementation.
  */
object TopKAgg {

  /** One ranked entry: ordering is (score desc, id asc). */
  final case class Entry(score: Double, id: Long)

  final class TopKAggregator(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    private def bound(s: Seq[Entry]): Seq[Entry] =
      s.sortBy(e => (-e.score, e.id)).take(k)
    override def zero: Seq[Entry] = Nil
    // Size-gated sort: append until the buffer holds 2k entries, then
    // sort-and-truncate to k — one O(k log k) sort per k appends
    // instead of a full re-sort on EVERY input row. An entry outside
    // the best k of any 2k-snapshot can never re-enter the group's
    // top k, so truncation loses nothing; the buffer stays bounded
    // (< 2k) for the exchange, and `finish` restores the sorted
    // invariant for output.
    override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] = {
      val appended = e +: buf
      if (appended.length >= 2 * k) bound(appended) else appended
    }
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      bound(a ++ b)
    override def finish(buf: Seq[Entry]): Seq[Entry] = bound(buf)
    override def bufferEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
  }

  /** Column-API entry: `top_k(k)(scoreCol, idCol)` usable inside any
    * `groupBy(...).agg(...)`; returns the group's top-k entries sorted
    * (score desc, id asc). */
  def top_k(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), ExpressionEncoder[Entry]())
      .apply(score, id)
}
