package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Map-side top-k aggregate: keeps a bounded (score, id) heap per group.
  *
  * The composable top-k-per-group (window `row_number() <= k`) shuffles
  * EVERY scored row to the window partition before discarding all but k —
  * at 100 TB of ANN candidates that shuffle is the job. As a
  * `TypedImperativeAggregate`, partial aggregation keeps at most k pairs
  * per group per map task; only k-sized buffers cross the wire
  * (SURVEY.md §4/§7.3: the one operator worth a custom aggregate).
  *
  * Deterministic: orders by (score desc, id asc); ties at the k boundary
  * keep the lower id — same total order as the window formulation and
  * the DuckDB oracle, which is how it's validated.
  *
  * Output: array<struct<score: double, id: long>> sorted best-first.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // Scala's PriorityQueue dequeues the MAXIMUM under its ordering, so
  // "worse" must compare as greater: lower score is worse; on equal
  // score, the larger id is worse. Head = eviction candidate.
  private val evictFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score ⇒ greater
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger id ⇒ greater
    }
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](evictFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], x: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(x)
    else if (evictFirst.lt(x, buf.head)) { buf.dequeue(); buf.enqueue(x) }
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // Ascending under evictFirst = best-first.
    val sorted = buf.toArray.sorted(evictFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))

  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ExprBridge

  /** Column API: `topk(score, id, k)` → array<struct<score,id>> best-first. */
  def topk(score: Column, id: Column, k: Int): Column =
    ExprBridge.column(TopKByScore(
      ExprBridge.expression(score), ExprBridge.expression(id), k)
      .toAggregateExpression())
}
