package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of `array<bigint>` columns — the centroid /
  * lane-sum aggregation kernel.
  *
  * The composed form everywhere else in the engine was
  * `posexplode(qv) -> groupBy(pos) -> sum` — correct, but it inflates
  * the corpus dim-fold (n·dim shuffle rows) and rebuilds the vector
  * afterwards with `collect_list + array_sort + transform` (two
  * ObjectHashAggregate levels). This aggregate folds each partition's
  * arrays into ONE i64 buffer (map-side partial), ships buffers —
  * dim longs per partition per group, not per row — and emits the
  * summed array directly. Values are bit-identical to the explode
  * form: i64 addition is exact and associative, so any grouping or
  * merge order yields the same array and every DuckDB oracle is
  * unchanged.
  *
  * Contracts, matching the engine's uniform-dim vector model:
  *  - NULL input arrays are SKIPPED (the explode form never emits
  *    rows for them);
  *  - a length mismatch within one group RAISES: ragged vectors are
  *    always a data bug, and the explode form's silent per-lane
  *    partial sums are exactly the failure mode to refuse;
  *  - an empty group (or all-NULL) evaluates to NULL;
  *  - under ANSI (this repo's default) lane overflow raises via
  *    addExact instead of wrapping, same as [[DotProductLong]].
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vsum"

  private val failOnOverflow =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  // null buffer = "no rows seen yet"; sized lazily off the first array
  override def createAggregationBuffer(): Array[Long] = null

  private def raggedError(have: Int, got: Int): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: ragged input — group mixes array lengths " +
        s"$have and $got; vectors in one aggregation must share dim")

  private def addInto(buf: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val acc = if (buf == null) new Array[Long](n) else buf
    if (acc.length != n) raggedError(acc.length, n)
    var i = 0
    if (failOnOverflow)
      while (i < n) { acc(i) = Math.addExact(acc(i), arr.getLong(i)); i += 1 }
    else
      while (i < n) { acc(i) += arr.getLong(i); i += 1 }
    acc
  }

  // primitive-lane merge: partial buffers arrive as Array[Long], and
  // wrapping them in GenericArrayData just to reuse the ArrayData fold
  // would box every lane on every shuffle merge
  private def addInto(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (buf == null) return other
    if (buf.length != other.length) raggedError(buf.length, other.length)
    var i = 0
    if (failOnOverflow)
      while (i < buf.length) { buf(i) = Math.addExact(buf(i), other(i)); i += 1 }
    else
      while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer else addInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other == null) buffer else addInto(buffer, other)

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null else new GenericArrayData(buffer.clone())

  // one presence byte ahead of the lanes: a zero-length byte string is
  // ONLY the null "no rows seen" buffer, so a group of genuinely
  // empty (dim-0) arrays survives a partial->final exchange as an
  // empty array instead of flipping to NULL — the result must not
  // depend on whether the plan inserted a shuffle
  override def serialize(buffer: Array[Long]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(1 + 8 * buffer.length)
    bb.put(1: Byte)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.get() // presence marker
    Array.fill((bytes.length - 1) / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
