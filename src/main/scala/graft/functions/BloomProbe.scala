package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Codegen'd membership probe against a pre-built [[BloomFilter]] of key
 * hashes — the row-level half of the merge-on-read untouched-base prune
 * (LakeTable.readResolved): base rows whose `xxhash64(keys)` the filter
 * provably does not contain can bypass the bucket-local fold (and its
 * in-partition sort) entirely.
 *
 * Contract: NO FALSE NEGATIVES — a hash that was `put` always probes true,
 * so filtering a mixed base+delta scan by this predicate can only drop base
 * rows whose key carries no delta. False positives merely send an untouched
 * row through the fold, where it folds to itself. The filter ships as a
 * [[Broadcast]] — materialized ONCE per executor in the block manager and
 * shared by every task — rather than riding the plan as a reference object,
 * which would be re-deserialized from the task binary by each of the
 * potentially thousands of fold + passed-side tasks (a near-cap filter is
 * tens of MB; per-task copies would multiply that by the task concurrency).
 */
case class BloomKeyMightContain(child: Expression, bloom: Broadcast[BloomFilter])
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_key_might_contain"
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be bigint (a key hash), got " +
        child.dataType.catalogString)

  override def nullSafeEval(h: Any): Any =
    bloom.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcCls)
    // unwrap once per generated-class instance, not once per row: value()
    // hits the executor-local broadcast cache but is still a method call
    // plus a validity check we keep out of the per-row loop
    val filter = ctx.addMutableState(bfCls, "bloomFilter",
      v => s"$v = ($bfCls) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$filter.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomKeyMightContain =
    copy(child = c)
}

object BloomProbe {
  def bloom_key_might_contain(hash: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomKeyMightContain(Bridge.expression(hash), bloom))
}
