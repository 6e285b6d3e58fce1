package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pre-filter, the classic shuffle-volume killer for
  * selective fact⋈dim joins at 100 TB: build a filter over the (small,
  * already-filtered) dimension keys with `DataFrameStatFunctions
  * .bloomFilter` — a distributed treeAggregate whose partials are the
  * filter's own bitset, so only ~MBs ever reach the driver — then drop
  * non-matching fact rows map-side BEFORE the exchange. False positives
  * (fpp ~1%) are removed by the exact semi-join that follows; false
  * negatives are impossible, so the composite is exactly the semi-join
  * while shuffling only ~selectivity + fpp of the fact table.
  *
  * The probe is a native Catalyst expression so it stays inside
  * whole-stage codegen next to the scan (the filter object rides along as
  * a codegen reference, broadcast with the task binary); a Scala UDF here
  * would box every key and break the codegen span that also evaluates the
  * pushed-down scan predicates.
  */
object BloomFilterExpressions {

  /** True iff `c` (integral) might be in `bf`; null for null keys.
    * Exact-join afterwards for the no-false-positives contract.
    */
  def mightContainLong(c: Column, bf: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(c), bf))
}

/** `bf.mightContainLong(child)` with codegen. The filter is carried as a
  * reference object (serialized once per task binary, like a literal), not
  * re-read per row.
  */
case class BloomMightContainLong(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long => bf.mightContainLong(l)
    case i: java.lang.Integer => bf.mightContainLong(i.longValue())
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong((long) $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
