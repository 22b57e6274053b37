package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Size-bounded `collect_list` over a bigint column: gathers values
  * until the group exceeds `limit` elements, then flips to a permanent
  * overflow state, drops the partial list, and ignores the rest of the
  * group. Finalizes to the collected array, or NULL for overflowed
  * groups.
  *
  * `bounded_collect_long(x, limit)` followed by `WHERE ids IS NOT NULL`
  * is semantically identical to
  * `collect_list(x) ... WHERE size(ids) <= limit`, but with a hard
  * memory bound: a key with a billion members holds `limit + 1` longs
  * in its aggregation buffer at the worst moment, never the full
  * posting. This is what makes the stop-shingle rule of
  * [[graft.operators.Dedup.ngramJaccardPairs]] safe on a real corpus —
  * a mega-hot shingle (df in the millions) is discarded without ever
  * materializing its postings array, in the partial aggregate on the
  * map side, before the shuffle.
  *
  * Overflow short-circuit: partial buffers that overflowed serialize as
  * a single flag byte, so hot keys also ship near-zero bytes through
  * the shuffle.
  */
case class BoundedCollectAgg(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && limit >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_long expects a bigint column and limit >= 1; got " +
        s"${child.dataType.simpleString}, limit=$limit")

  override def createAggregationBuffer(): BoundedCollectAgg.Buf =
    new BoundedCollectAgg.Buf(new mutable.ArrayBuffer[Long], overflowed = false)

  override def update(buf: BoundedCollectAgg.Buf, input: InternalRow): BoundedCollectAgg.Buf = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        if (buf.values.length >= limit) {
          buf.overflowed = true
          buf.values.clear()
        } else buf.values += v.asInstanceOf[Long]
      }
    }
    buf
  }

  override def merge(b1: BoundedCollectAgg.Buf, b2: BoundedCollectAgg.Buf): BoundedCollectAgg.Buf = {
    if (b1.overflowed || b2.overflowed ||
        b1.values.length + b2.values.length > limit) {
      b1.overflowed = true
      b1.values.clear()
    } else b1.values ++= b2.values
    b1
  }

  override def eval(buf: BoundedCollectAgg.Buf): Any =
    if (buf.overflowed) null
    else new GenericArrayData(buf.values.toArray)

  override def serialize(buf: BoundedCollectAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.overflowed)
    if (!buf.overflowed) {
      out.writeInt(buf.values.length)
      buf.values.foreach(out.writeLong)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val overflowed = in.readBoolean()
    val values = new mutable.ArrayBuffer[Long]
    if (!overflowed) {
      val n = in.readInt()
      var i = 0
      while (i < n) { values += in.readLong(); i += 1 }
    }
    new BoundedCollectAgg.Buf(values, overflowed)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object BoundedCollectAgg {
  final class Buf(val values: mutable.ArrayBuffer[Long], var overflowed: Boolean)
}

object BoundedCollectFunctions {
  /** Canonical builder (shared with [[graft.GraftExtensions]]). */
  def builder(exprs: Seq[Expression]): Expression =
    BoundedCollectAgg(exprs(0),
      FunctionArgs.intLit("bounded_collect_long", exprs, 1))

  /** Register `bounded_collect_long(col, limit)` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_collect_long", builder, "built-in")
}
