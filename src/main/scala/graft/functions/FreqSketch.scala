package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native
  * `TypedImperativeAggregate` (SURVEY §2.10 U7) — the mergeable
  * heavy-hitter summary for a 100 TB column: each map partition keeps at
  * most `k` counters (constant memory regardless of input size), partials
  * serialize through the normal agg shuffle, and merge preserves the
  * deterministic error bound (Agarwal et al., "Mergeable Summaries",
  * PODS'12):
  *
  *   true(item) − N/(k+1)  ≤  cnt(item)  ≤  true(item)
  *
  * so every item with true frequency > N/(k+1) is guaranteed present. When
  * the column's distinct count is ≤ k the sketch never decrements and the
  * result is EXACTLY `GROUP BY count(*)` — independent of partitioning and
  * merge order — which is what the driver oracle pins (`ta_heavy`); the
  * approximate regime is pinned by the bound test in the suite.
  *
  * Update: hit → +1; miss with a free slot → insert 1; miss with k live
  * counters → decrement ALL by one and drop zeros (the new item is not
  * inserted — its single occurrence is absorbed by the same decrement).
  * Merge: pointwise counter sum, then if more than k survive, subtract the
  * (k+1)-th largest count from every counter and keep the positives.
  */
case class FreqSketchMG(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "mg_topk capacity must be >= 1")

  // Registered in the session FunctionRegistry, so arbitrary SQL reaches
  // update(); without this check a non-string child passes analysis and then
  // every task dies on the asInstanceOf[UTF8String] mid-job.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_topk requires a STRING item column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // full: decrement-all (absorbs this occurrence too)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (i, c) => if (c <= 0) dead += i }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (i, c) => buf.update(i, buf.getOrElse(i, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count; > 0 survivors number <= k
      val cut = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => InternalRow(UTF8String.fromString(i), c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("cnt", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchMG =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchMG =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchMG =
    copy(child = newChild)
  override def prettyName: String = "mg_topk"
}

object FreqSketchMG {
  import org.apache.spark.sql.graftshim.GraftShim

  /** Column API: `mgTopK(col, 128)` aggregates to array<struct<item,cnt>>. */
  def mgTopK(c: Column, k: Int): Column =
    GraftShim.column(
      FreqSketchMG(GraftShim.catalystExpression(c), k).toAggregateExpression())

  /** SQL builder for `mg_topk(expr, k)` — k must be a foldable int. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[FreqSketchMG].getName, "mg_topk"),
      (children: Seq[Expression]) => children match {
        case Seq(e, Literal(k: Int, IntegerType)) => FreqSketchMG(e, k)
        case _ => throw new IllegalArgumentException(
          "mg_topk(expr, k): k must be an integer literal")
      })
}
