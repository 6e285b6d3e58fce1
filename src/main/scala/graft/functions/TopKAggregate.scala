package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (value, key) candidate for a per-group top-k. */
case class TopKEntry(price: Double, key: Long)

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
  * Determinism: candidates are ordered by (price desc, key asc) — the
  * same total order as the window twin, so results are row-identical and
  * the window query's SQL is a valid oracle. The buffer is a plain sorted
  * Seq (k is small; insertion cost is k log k on ≤ 2k elements).
  */
class TopKAggregate(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  private def trim(s: Seq[TopKEntry]): Seq[TopKEntry] =
    s.sortBy(e => (-e.price, e.key)).take(k)

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
