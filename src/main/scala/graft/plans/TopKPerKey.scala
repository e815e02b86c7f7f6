package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DoubleType

/** Whole-operator custom plan: top-k rows per key by a double-valued
  * score, as a logical node + planner [[Strategy]] + physical exec pair.
  *
  * The built-in route — `row_number().over(Window.partitionBy(keys)
  * .orderBy(score.desc)) <= k` — fully sorts every key group after the
  * shuffle: O(n log n) per group in time and O(group) in memory, spilled
  * for hot keys. This operator keeps a bounded k-element heap per key,
  * in two phases: a partial pass before the shuffle caps every
  * partition's contribution at k rows per key (a map-side combine for
  * top-k), then the exchange moves at most k·partitions rows per key,
  * and the final pass merges. Operator memory is O(maxPartialKeys·k)
  * rows in the partial phase and O(k) in the global merge regardless
  * of group size or key cardinality — the property the window route
  * lacks at 100 TB.
  *
  * The partial phase additionally bounds its key map at
  * `maxPartialKeys`: once that many keys are tracked in a partition,
  * rows of unseen keys pass through uncombined (the same graceful
  * degradation hash-aggregate uses when its map fills) — extreme key
  * cardinality costs shuffle volume, never executor memory. The
  * global phase demands key-SORTED input (`requiredChildOrdering`),
  * so EnsureRequirements plants a Sort after the exchange and the
  * merge streams one consecutive key group at a time through a single
  * reused k-heap: O(k) live rows regardless of how many keys land in
  * the partition. Memory pressure at extreme cardinality lands on the
  * planted Sort, which spills through Spark's external sorter — the
  * operator itself never holds more than one group's top-k.
  *
  * Tier (c) of the brief's preference order, used where it genuinely
  * wins; registered via [[graft.GraftExtensions]] or
  * `spark.experimental.extraStrategies`.
  */
final case class TopKPerKey(
    keyExprs: Seq[Expression],
    scoreExpr: Expression,
    k: Int,
    maxPartialKeys: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(maxPartialKeys > 0, "maxPartialKeys must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, score, k, maxPartialKeys, child) =>
      val partial = TopKPerKeyExec(keys, score, k, maxPartialKeys, global = false, planLater(child))
      TopKPerKeyExec(keys, score, k, maxPartialKeys, global = true, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keyExprs: Seq[Expression],
    scoreExpr: Expression,
    k: Int,
    maxPartialKeys: Int,
    global: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The global phase demands co-location by key; EnsureRequirements
    * inserts the hash exchange between the two phases.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (global) ClusteredDistribution(keyExprs) :: Nil else UnspecifiedDistribution :: Nil

  /** The global phase additionally demands key-sorted input, so its
    * merge can stream one consecutive key group at a time with a
    * single reused k-heap. The planted Sort is Spark's external
    * (spilling) sorter — that is where unbounded key cardinality goes,
    * instead of an unbounded per-key hash map here.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (global) Seq(keyExprs.map(SortOrder(_, Ascending))) else Seq(Nil)

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  private def scoreOf(bound: Expression, row: InternalRow): Double =
    bound.eval(row) match {
      case null => Double.NegativeInfinity
      case d: java.lang.Double => d.doubleValue()
      case other => other.asInstanceOf[Double]
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprsLocal = keyExprs
    val scoreLocal = BindReferences.bindReference(scoreExpr, child.output)
    val childOutput = child.output
    val capLocal = maxPartialKeys
    if (global) {
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprsLocal, childOutput)
        // min-heap on score: the head is the weakest of the current top-k
        implicit val ord: Ordering[(Double, UnsafeRow)] =
          Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
        val heap = mutable.PriorityQueue.empty[(Double, UnsafeRow)]
        def push(row: InternalRow, s: Double): Unit =
          if (heap.size < k) {
            heap.enqueue((s, row.copy().asInstanceOf[UnsafeRow]))
          } else if (heap.head._1 < s) {
            heap.dequeue()
            heap.enqueue((s, row.copy().asInstanceOf[UnsafeRow]))
          }
        new Iterator[InternalRow] {
          // first row of the not-yet-consumed group (copied: the
          // source iterator reuses its row buffer)
          private var pending: InternalRow = if (iter.hasNext) iter.next().copy() else null
          private var pendingKey: UnsafeRow =
            if (pending != null) keyProj(pending).copy() else null
          private var emit: Iterator[InternalRow] = Iterator.empty

          private def advanceGroup(): Unit = {
            heap.clear()
            val groupKey = pendingKey
            push(pending, scoreOf(scoreLocal, pending))
            pending = null; pendingKey = null
            var done = false
            while (!done && iter.hasNext) {
              val r = iter.next()
              val rk = keyProj(r) // reused buffer: compare, copy only on group change
              if (rk == groupKey) push(r, scoreOf(scoreLocal, r))
              else { pending = r.copy(); pendingKey = rk.copy(); done = true }
            }
            emit = heap.toList.map(_._2: InternalRow).iterator
          }

          override def hasNext: Boolean = {
            if (!emit.hasNext && pending != null) advanceGroup()
            emit.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty partition")
            emit.next()
          }
        }
      }, preservesPartitioning = true)
    } else {
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprsLocal, childOutput)
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, UnsafeRow)]]
        implicit val ord: Ordering[(Double, UnsafeRow)] =
          Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
        // Lazily drains the input, emitting pass-through rows as they
        // occur (unseen keys over the cap, uncombined); heap contents
        // follow once the input is exhausted.
        val passedThrough = iter.flatMap { row =>
          val score = scoreOf(scoreLocal, row)
          val key = keyProj(row)
          heaps.get(key) match {
            case None if heaps.size >= capLocal =>
              Some(row: InternalRow) // unseen key over the cap: uncombined
            case maybe =>
              val heap = maybe.getOrElse {
                val h = mutable.PriorityQueue.empty[(Double, UnsafeRow)]
                heaps(key.copy()) = h
                h
              }
              if (heap.size < k) {
                heap.enqueue((score, row.copy().asInstanceOf[UnsafeRow]))
              } else if (heap.head._1 < score) {
                heap.dequeue()
                heap.enqueue((score, row.copy().asInstanceOf[UnsafeRow]))
              }
              None
          }
        }
        passedThrough ++ heaps.valuesIterator.flatMap(_.iterator.map(_._2: InternalRow))
      }, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level entry point. */
object TopK {

  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }

  /** Top `k` rows per `keyCols` group by `scoreCol` (descending).
    * `scoreCol` must be double-valued. Row order within the result is
    * unspecified; ties at the k-th place keep an arbitrary winner.
    * `maxPartialKeys` bounds the map-side combine's memory at
    * keys·(k+1) rows per task; beyond it, rows pass through to the
    * exchange uncombined (correct, just less pre-aggregated).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], scoreCol: String, k: Int,
             maxPartialKeys: Int = 1 << 17): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n in ${analyzed.output.map(_.name)}"))
    val score = attr(scoreCol)
    require(score.dataType == DoubleType, s"$scoreCol must be double, is ${score.dataType}")
    ColumnBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKey(keyCols.map(attr), score, k, maxPartialKeys, analyzed))
  }
}
