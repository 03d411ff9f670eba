package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (`Aggregator[IN, BUF, OUT]`): bounded top-k of a
  * long column. The buffer never exceeds k elements, so partial
  * aggregation ships O(k) per partition regardless of group size — the
  * shape that makes per-group top-k viable at 100 TB without a full sort.
  * Register with `functions.udaf(new TopKAgg(k))`.
  */
class TopKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], a: Long): Seq[Long] =
    if (buf.length < k) (buf :+ a).sortBy(-_)
    else if (a > buf.last) (buf.init :+ a).sortBy(-_)
    else buf

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).sortBy(-_).take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r.sortBy(-_)

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
