package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed [[Aggregator]] — the
  * mergeable-summary machinery heavy-hitter detection needs at scale:
  * each partition folds its rows into a ≤k-entry counter map, the
  * partial maps MERGE associatively (Agarwal et al., "Mergeable
  * Summaries", PODS'12), and only k-sized state ever crosses the
  * shuffle.
  *
  * Guarantee (order-independent, any merge tree): the final map
  * contains EVERY item with true count > N/(k+1). Estimated counts
  * undercount by at most N/(k+1). The candidate set itself can vary
  * with partitioning — consumers needing deterministic output re-count
  * the ≤k candidates exactly in a second pass (text_heavy_hitters).
  */
case class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], word: String): Map[String, Long] =
    b.get(word) match {
      case Some(c) => b.updated(word, c + 1)
      case None if b.size < k => b.updated(word, 1L)
      case None =>
        // decrement-all; drop zeros (classic MG step)
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, drop <=0
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - kth).filter(_._2 > 0).toMap
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Reference single-threaded fold, for property tests. */
  def sequential(k: Int, items: Iterable[String]): Map[String, Long] =
    items.foldLeft(Map.empty[String, Long])(MisraGries(k).reduce)
}
