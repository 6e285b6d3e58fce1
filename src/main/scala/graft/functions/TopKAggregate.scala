package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.expressions.Aggregator

/** One (value, key) candidate for a per-group top-k. Fields are Options so
  * NULL inputs rank like the window twin ranks them instead of crashing the
  * encoder's non-nullable deserializer.
  */
case class TopKEntry(price: Option[Double], key: Option[Long])

/** Top-k per group as a typed Aggregator (the engine's one UDAF,
  * SURVEY.md §2.2 note) — the scale-preferred formulation of
  * q_topk_pergroup's window+filter:
  *
  *  - window top-k shuffles EVERY row of the group to one reducer and
  *    sorts the whole partition;
  *  - aggregate top-k keeps at most k entries per group per map task
  *    (partial aggregation), so the shuffle carries ≤ k rows per group per
  *    partition and no sort of the full group ever happens.
  *
  * Determinism: candidates are ordered by (price DESC NULLS LAST, key ASC
  * NULLS FIRST) using Spark SQL's double semantics (NaN greatest,
  * -0.0 == 0.0 via SQLOrderingUtil) — the same total order as the window
  * twin's ORDER BY, so results are row-identical even on NaN/-0.0/NULL
  * inputs and the window query's SQL is a valid oracle. The buffer is a
  * plain sorted Seq (k is small; insertion cost is k log k on ≤ 2k
  * elements).
  */
class TopKAggregate(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  private val ord: Ordering[TopKEntry] = (x: TopKEntry, y: TopKEntry) => {
    val byPrice = (x.price, y.price) match {
      case (Some(a), Some(b)) => SQLOrderingUtil.compareDoubles(b, a) // DESC
      case (Some(_), None)    => -1 // NULLS LAST under DESC
      case (None, Some(_))    => 1
      case (None, None)       => 0
    }
    if (byPrice != 0) byPrice
    else (x.key, y.key) match {
      case (Some(a), Some(b)) => java.lang.Long.compare(a, b) // ASC
      case (None, Some(_))    => -1 // NULLS FIRST under ASC
      case (Some(_), None)    => 1
      case (None, None)       => 0
    }
  }

  private def trim(s: Seq[TopKEntry]): Seq[TopKEntry] = s.sorted(ord).take(k)

  override def zero: Seq[TopKEntry] = Nil
  override def reduce(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] = trim(a +: b)
  override def merge(x: Seq[TopKEntry], y: Seq[TopKEntry]): Seq[TopKEntry] = trim(x ++ y)
  override def finish(b: Seq[TopKEntry]): Seq[TopKEntry] = trim(b)
  override def bufferEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]]()
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]]()
}

object TopKAggregate {
  /** Column-API handle: `topk(col("price"), col("key"))` → array<struct>. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregate(k), Encoders.product[TopKEntry])
}
