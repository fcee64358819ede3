package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `sample_ids(key, id, n)`: the `n` ids with the SMALLEST `(key, id)`
  * pairs per group, as an ascending-by-key array — a deterministic
  * bounded-memory per-group sample when `key` is a seed-keyed hash (the
  * [[graft.operators.Pipeline.shuffleKey]] convention).
  *
  * Why an aggregate and not a window: `row_number()` sampling shuffles and
  * sorts EVERY row of the corpus to keep n per group. This
  * TypedImperativeAggregate keeps a bounded heap of n candidates per
  * group in the PARTIAL (map-side) aggregation, so only `groups x n`
  * candidates ever reach the exchange — at 100 TB that is the difference
  * between shuffling the corpus and shuffling the sample. State per group
  * is O(n) by construction; heaps merge associatively, so the result is
  * partitioning-independent.
  *
  * Selection is a pure function of (key, id): the same bottom-n any
  * engine computes with `ORDER BY key, id LIMIT n` — ties on the full
  * (key, id) pair are impossible for distinct ids, so the sample is
  * total-order deterministic and oracle-replayable.
  */
case class BoundedHashSampleAgg(
    keyExpr: Expression, idExpr: Expression, n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedHashSampleAgg.Buffer]
  with BinaryLike[Expression] {

  require(n > 0, s"sample_ids size must be positive, got $n")

  override def left: Expression = keyExpr
  override def right: Expression = idExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (keyExpr.dataType, idExpr.dataType) match {
      case (_: StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (k, i) => TypeCheckResult.TypeCheckFailure(
        s"sample_ids expects (string key, bigint id, int literal n), got " +
          s"(${k.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sample_ids"

  override def createAggregationBuffer(): BoundedHashSampleAgg.Buffer =
    new BoundedHashSampleAgg.Buffer(n)

  override def update(buf: BoundedHashSampleAgg.Buffer,
                      input: InternalRow): BoundedHashSampleAgg.Buffer = {
    val k = keyExpr.eval(input)
    val id = idExpr.eval(input)
    if (k != null && id != null)
      buf.offer(k.asInstanceOf[UTF8String].toString, id.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedHashSampleAgg.Buffer,
                     b: BoundedHashSampleAgg.Buffer): BoundedHashSampleAgg.Buffer = {
    b.foreach(a.offer)
    a
  }

  override def eval(buf: BoundedHashSampleAgg.Buffer): Any =
    new GenericArrayData(buf.sortedIds)

  override def serialize(buf: BoundedHashSampleAgg.Buffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, id) => out.writeUTF(k); out.writeLong(id) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedHashSampleAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedHashSampleAgg.Buffer(n)
    val count = in.readInt()
    var i = 0
    while (i < count) { buf.offer(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedHashSampleAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedHashSampleAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedHashSampleAgg =
    copy(keyExpr = newLeft, idExpr = newRight)
}

object BoundedHashSampleAgg {

  /** Bounded "keep the n smallest (key, id)" state: a max-heap so the
    * current worst survivor is O(1) to inspect and evict. Hex-hash keys
    * are ASCII, where Java string order equals UTF-8 byte order — the
    * ordering any SQL engine applies to the same strings.
    */
  final class Buffer(n: Int) {
    private val ord = Ordering.Tuple2(Ordering.String, Ordering.Long)
    private val heap = scala.collection.mutable.PriorityQueue.empty[(String, Long)](ord)

    def size: Int = heap.size

    def offer(key: String, id: Long): Unit = offer((key, id))

    def offer(e: (String, Long)): Unit =
      if (heap.size < n) heap.enqueue(e)
      else if (ord.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }

    def foreach(f: ((String, Long)) => Unit): Unit = heap.foreach(f)

    def sortedIds: Array[Long] =
      heap.toArray.sorted(ord).map(_._2)
  }
}
