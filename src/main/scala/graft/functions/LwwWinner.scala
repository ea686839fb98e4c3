package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/**
 * Hash-aggregable last-writer-wins winner: `lww_winner(payload, lsn)` ≡
 * `max_by(payload, lsn)` for a LongType ordering — same strictly-greater
 * update rule (first-seen max wins ties, ties do not occur under unique
 * LSNs), same null contract (null ordering values are ignored; an empty
 * group yields NULL).
 *
 * Why it exists: `max_by` is a DeclarativeAggregate whose buffer holds the
 * payload STRUCT, which `HashAggregateExec` cannot store in its mutable
 * row, so the per-key LWW reduction — the single hottest stage of every
 * CDC ingest — planned as **SortAggregate**: both sides of the shuffle
 * fully SORTED every event row with its payload (measured ~20 s of a 25 s
 * reduce at 32M events / 8 cores). A TypedImperativeAggregate is exactly
 * what `ObjectHashAggregateExec` exists for: per-key buffers live as
 * objects in a hash map, no sort on either side, graceful sort-based
 * fallback if the map outgrows
 * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (raise it
 * for bulk loads — the default 128 is sized for giant sketch buffers, not
 * for a ~200-byte winner row).
 *
 * Buffer = (lsn, winning payload row); partial buffers serialize as
 * 8 bytes of LSN + the payload as an UnsafeRow — the same bytes the plain
 * reduction shuffled.
 */
case class LwwWinner(
    payload: Expression,
    ordering: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LwwWinner.Buf] {

  override def children: Seq[Expression] = Seq(payload, ordering)
  override def dataType: DataType = payload.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "lww_winner"

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, ordering.dataType) match {
      case (_: StructType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (p, o) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (struct, bigint), got (${p.catalogString}, ${o.catalogString})")
    }

  private lazy val structType = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): LwwWinner.Buf = new LwwWinner.Buf

  override def update(b: LwwWinner.Buf, input: InternalRow): LwwWinner.Buf = {
    val o = ordering.eval(input)
    if (o != null) {
      val lsn = o.asInstanceOf[Long]
      if (!b.has || lsn > b.lsn) {
        val p = payload.eval(input)
        b.has = true
        b.lsn = lsn
        // copy: eval may return a row backed by the (reused) input buffer
        b.row = if (p == null) null
                else p.asInstanceOf[InternalRow].copy()
      }
    }
    b
  }

  override def merge(b1: LwwWinner.Buf, b2: LwwWinner.Buf): LwwWinner.Buf =
    if (b2.has && (!b1.has || b2.lsn > b1.lsn)) b2 else b1

  override def eval(b: LwwWinner.Buf): Any = if (b.has) b.row else null

  override def serialize(b: LwwWinner.Buf): Array[Byte] = {
    if (!b.has) return Array.emptyByteArray
    val unsafe: UnsafeRow = b.row match {
      case null => null
      case u: UnsafeRow => u
      case r => toUnsafe(r)
    }
    val rowBytes = if (unsafe == null) Array.emptyByteArray else unsafe.getBytes
    val out = new Array[Byte](9 + rowBytes.length)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(if (b.row == null) 0.toByte else 1.toByte)
    bb.putLong(b.lsn)
    bb.put(rowBytes): Unit
    out
  }

  override def deserialize(bytes: Array[Byte]): LwwWinner.Buf = {
    val b = new LwwWinner.Buf
    if (bytes.isEmpty) return b
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hasRow = bb.get() == 1.toByte
    b.has = true
    b.lsn = bb.getLong()
    if (hasRow) {
      val row = new UnsafeRow(structType.size)
      row.pointTo(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 9, bytes.length - 9)
      b.row = row
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LwwWinner =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LwwWinner =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LwwWinner =
    copy(payload = newChildren(0), ordering = newChildren(1))
}

object LwwWinner {
  final class Buf {
    var has: Boolean = false
    var lsn: Long = Long.MinValue
    var row: InternalRow = null
  }

  def lww_winner(payload: Column, ordering: Column): Column =
    Bridge.column(LwwWinner(
      Bridge.expression(payload), Bridge.expression(ordering))
      .toAggregateExpression())
}
