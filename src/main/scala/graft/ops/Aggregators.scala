package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates — SURVEY.md §2.12's escalation path for folds
  * the built-ins can't express. Registered via `functions.udaf` when a
  * Column-API handle is needed.
  */
object Aggregators {

  /** Order-correct string concatenation: the reference's
    * accumulate-lines-in-order fold (F13/A4, detail_notes.py:58,76) as a
    * real `Aggregator` — merge-safe (buffers concatenate and sort), so it
    * is correct under partial aggregation, unlike a naive collect_list
    * concat which has no order guarantee.
    */
  final class ConcatInOrder extends Aggregator[(Long, String), List[(Long, String)], String] {
    override def zero: List[(Long, String)] = Nil
    override def reduce(b: List[(Long, String)], a: (Long, String)) = a :: b
    override def merge(x: List[(Long, String)], y: List[(Long, String)]) = x ++ y
    override def finish(b: List[(Long, String)]): String =
      b.sortBy(_._1).map(_._2).mkString(" ")
    override def bufferEncoder: Encoder[List[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Bounded top-k by score: keeps at most k (score, payload) pairs per
    * group — constant memory per group regardless of group size, the
    * aggregation-side alternative to window row_number + filter when
    * groups are huge (the 100 TB-safe shape for per-key top-k).
    */
  final class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {
    private def trim(b: List[(Double, Long)]) =
      b.sortBy { case (s, id) => (-s, id) }.take(k)
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], a: (Double, Long)) = trim(a :: b)
    override def merge(x: List[(Double, Long)], y: List[(Double, Long)]) = trim(x ++ y)
    override def finish(b: List[(Double, Long)]): Seq[Long] = trim(b).map(_._2)
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
