package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.GraftShim

/** Whole-operator custom Catalyst stack (SURVEY.md §2.10 preference (c)):
  * top-k rows per key WITHOUT a per-partition total sort.
  *
  * The stock formulation — `row_number().over(Window.partitionBy(keys)
  * .orderBy(ord)) <= k` — shuffles EVERY row of every key and then sorts
  * every partition. This operator instead:
  *
  *   1. [[PartialTopKExec]] (map side, before the exchange): bounded heap of
  *      k rows per key per input partition — the shuffle then moves at most
  *      `k * partitions` rows per key instead of all of them (the same
  *      partial-aggregation idea, applied to a selection);
  *   2. [[FinalTopKExec]] (requires `ClusteredDistribution(keys)` — Catalyst
  *      inserts the hash exchange): the same bounded-heap fold over the
  *      co-located survivors.
  *
  * Memory is O(distinct keys in partition * k) rows — the win over sort is
  * largest exactly when rows-per-key >> k, which is the 100 TB shape
  * (billions of candidates, top-5 kept). The ordering passed in MUST be
  * total (include a tie-break) for deterministic output; with a total order
  * the result set equals the window formulation bit-for-bit, which is how
  * the oracle states it.
  *
  * Injection: [[TopK.perKey]] registers [[TopKStrategy]] on the session's
  * `experimental.extraStrategies` (the public strategy-injection point) and
  * builds the frame from the logical node via the shim's `ofRows`.
  */
case class TopKPerKey(
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ord, k, child) =>
      FinalTopKExec(keys, ord, k, PartialTopKExec(keys, ord, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap fold: one pass over the partition, a k-capped heap
  * per key (worst row on top), emitted per key in ascending `ordering`.
  *
  * The PARTIAL (map-side) variant is memory-bounded and self-disabling: when
  * keys are near-unique the heap map would hold ~the whole partition on-heap
  * while filtering nothing, so the fold BAILS to passthrough — it drains the
  * heaps accumulated so far and streams the remaining rows through unchanged.
  * Bailing is always correct: every row the fold has dropped was dominated by
  * k better same-key rows which are all still in the heaps, so the partial
  * output remains a superset of each key's true top-k. Two triggers:
  *
  *   - key cap (`maxKeys`, default 2^17 via -Dgraft.topk.maxPartialKeys):
  *     hard memory bound of O(maxKeys * k) retained rows per partition;
  *   - selectivity probe: after [[PROBE_ROWS]] rows, if the heaps have
  *     retained >= 75% of input, the pre-selection cannot pay for its row
  *     copies — passthrough and let the exact final stage do the work.
  *
  * The FINAL (reduce-side) stage never bails — it is the exactness point and
  * its true memory need is O(distinct keys in partition * k) rows, the
  * operator's documented bound (PLANS.md).
  */
private[graft] object TopKFold {
  val PROBE_ROWS = 8192L

  def maxPartialKeys: Int =
    sys.props.get("graft.topk.maxPartialKeys").map(_.toInt).getOrElse(1 << 17)

  /** Exact fold (final stage): never bails. */
  def fold(
      it: Iterator[InternalRow],
      keyExprs: Seq[Expression],
      ordering: Seq[SortOrder],
      k: Int,
      inputSchema: Seq[Attribute]): Iterator[InternalRow] =
    foldPartial(it, keyExprs, ordering, k, inputSchema, Int.MaxValue, Long.MaxValue)

  /** Bounded fold (partial stage): may bail to passthrough (see header). */
  def foldPartial(
      it: Iterator[InternalRow],
      keyExprs: Seq[Expression],
      ordering: Seq[SortOrder],
      k: Int,
      inputSchema: Seq[Attribute],
      maxKeys: Int,
      probeRows: Long): Iterator[InternalRow] = {
    val keyGen = UnsafeProjection.create(keyExprs, inputSchema)
    val ord = new LazilyGeneratedOrdering(ordering, inputSchema)
    val worstFirst = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    }
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    var seen = 0L
    var retained = 0L
    var bailed = false
    var pendingBail: InternalRow = null
    while (!bailed && it.hasNext) {
      val row = it.next()
      val key = keyGen(row)
      var pq = heaps.get(key)
      if (pq == null) {
        if (heaps.size >= maxKeys) {
          pendingBail = row.copy() // this row not folded: emit it on the way out
          bailed = true
        } else {
          pq = new java.util.PriorityQueue[InternalRow](k, worstFirst)
          heaps.put(key.copy(), pq)
        }
      }
      if (!bailed) {
        seen += 1
        if (pq.size < k) { pq.add(row.copy()); retained += 1 }
        else if (ord.compare(row, pq.peek()) < 0) { pq.poll(); pq.add(row.copy()) }
        if (seen == probeRows && retained * 4 >= seen * 3) bailed = true
      }
    }
    import scala.jdk.CollectionConverters._
    val drained = heaps.values.iterator.asScala.flatMap { pq =>
      val arr = pq.toArray(new Array[InternalRow](pq.size))
      java.util.Arrays.sort(arr, ord)
      arr.iterator
    }
    if (!bailed) drained
    else if (pendingBail != null) drained ++ Iterator.single(pendingBail) ++ it
    else drained ++ it
  }
}

/** Map-side pre-selection: no distribution requirement, preserves child
  * partitioning; cuts shuffle volume to <= k rows per key per partition.
  */
case class PartialTopKExec(
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val (ke, ord, kk, schema) = (keyExprs, ordering, k, child.output)
    val (maxKeys, probe) = (TopKFold.maxPartialKeys, TopKFold.PROBE_ROWS)
    child.execute().mapPartitions(
      TopKFold.foldPartial(_, ke, ord, kk, schema, maxKeys, probe),
      preservesPartitioning = true)
  }
}

/** Reduce side: requires co-location by key (Catalyst inserts the hash
  * exchange via EnsureRequirements), then the same fold is exact.
  */
case class FinalTopKExec(
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val (ke, ord, kk, schema) = (keyExprs, ordering, k, child.output)
    child.execute().mapPartitions(TopKFold.fold(_, ke, ord, kk, schema),
      preservesPartitioning = true)
  }
}

object TopK {
  private[plans] def ensureStrategy(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  /** Enable [[AutoTopKRewrite]] on a live session: the naive
    * `row_number over window` + `rn <= k` formulation then plans as the
    * bounded-heap stack with no code change. `extraOptimizations` is the
    * public optimizer-rule injection point for running sessions (the
    * optimizer's final batch); new sessions get the same via
    * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`).
    */
  def ensureRule(spark: SparkSession): Unit = synchronized {
    ensureStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(AutoTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AutoTopKRewrite
  }

  /** Top-k rows per key by `order` (MUST be a total order for deterministic
    * output). Output column set = input column set; row order unspecified —
    * add an `orderBy` if the consumer needs one.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty && k > 0)
    val spark = df.sparkSession
    ensureStrategy(spark)
    val keyE = keys.map(GraftShim.catalystExpression)
    val ordE = order.map(GraftShim.sortOrder)
    GraftShim.ofRows(spark, TopKPerKey(keyE, ordE, k, GraftShim.logicalPlan(df)))
  }
}
