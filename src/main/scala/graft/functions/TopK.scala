package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k typed `Aggregator` (SURVEY §2.2: "Aggregator[IN,BUF,OUT] for
  * the one genuinely custom aggregate — exact weighted top-k").
  *
  * Input (id, score); keeps the k best by (score DESC, id ASC) — a total
  * order, so results are deterministic (row_number semantics, not rank).
  *
  * Why an Aggregator and not a window rank: the window form shuffles and
  * sorts EVERY row of every group; this buffer carries at most k entries
  * per group through the partial/merge tree (map-side combine), so the
  * shuffle volume is O(groups × k) regardless of group size — the 100 TB
  * shape for "top 10 per key over a trillion rows".
  */
class TopK(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0)

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty
  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    // buf is sorted; fast-path reject when full and worse than the floor
    if (buf.size >= k && !better(in, buf.last)) buf else trim(buf :+ in)
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)
  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
