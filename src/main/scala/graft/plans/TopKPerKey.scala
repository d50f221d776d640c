package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator: top-k rows per key by (score DESC, tie ASC) —
  * the (c)-tier extension (LogicalPlan + Strategy + SparkPlan), used
  * where built-ins genuinely can't express the efficient shape: the
  * window-function form (`row_number over (partition by k order by s)`
  * + filter) must fully sort every key group; this operator keeps a
  * bounded k-element heap per key and — crucially — runs a PARTIAL pass
  * before the shuffle, so at 100 TB each mapper ships at most k rows per
  * key instead of the whole group (the same partial/final contract as
  * hash aggregation, which no window function has).
  *
  * Semantics proven equal to [[graft.ops.Relational.windowTopK]] and the
  * DuckDB row_number oracle (ties impossible by construction: tie column
  * is unique per key).
  */
case class TopKPerKeyPlan(keys: Seq[Expression], score: Expression,
    tie: Expression, k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], score: Expression,
    tie: Expression, k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val numKeys = keys.size
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      // one generated projection for (score, tie) → primitive reads per
      // row, no boxing in the heap loop
      val ordProj = UnsafeProjection.create(
        Seq(Cast(score, DoubleType), Cast(tie, LongType)), childOutput)
      // PriorityQueue dequeues the MAX by its ordering; make the max the
      // worst element (lowest score, then highest tie) so it's evicted
      val worstFirst = Ordering.by[(Double, Long, UnsafeRow), (Double, Long)] {
        case (s, t, _) => (-s, t)
      }
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[(Double, Long, UnsafeRow)]]
      it.foreach { row =>
        val key = keyProj(row)
        val ord = ordProj(row)
        val s = ord.getDouble(0)
        val t = ord.getLong(1)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < k) heap.enqueue((s, t, row.asInstanceOf[UnsafeRow].copy()))
            else {
              val (ws, wt, _) = heap.head
              if (s > ws || (s == ws && t < wt)) {
                heap.dequeue()
                heap.enqueue((s, t, row.asInstanceOf[UnsafeRow].copy()))
              }
            }
          case None =>
            val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)
            heap.enqueue((s, t, row.asInstanceOf[UnsafeRow].copy()))
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** Planner strategy: logical TopKPerKeyPlan → partial exec (map side,
  * before the exchange EnsureRequirements inserts) + final exec.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, score, tie, k, child) =>
      TopKPerKeyExec(keys, score, tie, k, partial = false,
        TopKPerKeyExec(keys, score, tie, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Install the strategy + optimizer rules on an existing session
    * (idempotent); `GraftExtensions`-style injection works at builder
    * time too.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
    GraftOptimizerRules.install(spark)
  }

  /** Top-k rows of `df` per `keyCols`, ranked by `scoreCol` DESC with
    * `tieCol` ASC as the deterministic tie-break.
    */
  def apply(df: DataFrame, keyCols: Seq[String], scoreCol: String,
            tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column '$name'"))
    GraftBridge.ofRows(spark, TopKPerKeyPlan(
      keyCols.map(attr), attr(scoreCol), attr(tieCol), k, analyzed))
  }
}
