package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §7.3): exact top-k (value, weight)
  * pairs per group as an `Aggregator[IN, BUF, OUT]` — the engine-native
  * alternative to collect_list-then-sort when groups are huge: the
  * buffer never exceeds k entries, so memory per group is O(k) and the
  * merge is associative/commutative (safe under partial aggregation
  * and AQE re-planning).
  *
  * IN = (id, weight); OUT = ids sorted by weight desc, id asc tiebreak.
  */
class TopKByWeight(k: Int) extends Aggregator[(Long, Double), List[(Long, Double)], Seq[Long]] {

  private def trim(xs: List[(Long, Double)]): List[(Long, Double)] =
    xs.sortBy { case (id, w) => (-w, id) }.take(k)

  def zero: List[(Long, Double)] = Nil
  // buffer invariant: sorted by (-weight, id); a full buffer rejects
  // losers without re-sorting, so the common case is O(1) per row
  def reduce(buf: List[(Long, Double)], in: (Long, Double)): List[(Long, Double)] =
    if (buf.lengthCompare(k) < 0) trim(in :: buf)
    else {
      val (lid, lw) = buf.last
      if (lw > in._2 || (lw == in._2 && lid <= in._1)) buf
      else trim(in :: buf.init)
    }
  def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    trim(a ++ b)
  def finish(buf: List[(Long, Double)]): Seq[Long] = buf.map(_._1)

  def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
