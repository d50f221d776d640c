package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe global ordering: a 0-based global ordinal (dense
  * `row_number() - 1`) and an optional running sum over a total order,
  * WITHOUT the single-reducer `Window.orderBy(...)` sort.
  *
  * The classic two-pass shape (`zipWithIndex` generalised to carry a
  * cumulative sum):
  *
  *   1. `repartitionByRange` on the order key spreads the rows into
  *      contiguous key ranges — partition `i` holds only keys that sort
  *      before everything in partition `i+1` (equal keys never straddle
  *      a boundary: the range partitioner maps a key to exactly one
  *      partition) — and `sortWithinPartitions` makes each range
  *      internally ordered. ONE shuffle, fully parallel.
  *   2. A first pass computes each partition's row count and value sum
  *      (one tiny `(pid, count, sum, nNonNull)` row per partition — only
  *      `numPartitions` scalars reach the driver, never data).
  *   3. The exclusive prefix over those per-partition totals is the
  *      offset each partition adds to its LOCAL rank/cumsum; the offset
  *      arrays are broadcast and the second pass emits
  *      `ordinal = offset + local_rank` / `cum = offset_sum + local_sum`
  *      in a single ordered sweep per partition.
  *
  * Both passes read the same range shuffle (the `Dataset.rdd` is shared,
  * so Spark reuses the map output for the second job); nothing in the
  * plan serialises the corpus through one task. This is the 100 TB twin
  * of the global-window forms in [[graft.ext.DataPrep]] — equality with
  * those forms (ties, skew, empty partitions, leading NULL values) is
  * pinned in GlobalOrderSpec/DataPrepSpec.
  *
  * Running-sum semantics match SQL `SUM(v) OVER (ORDER BY ... ROWS
  * UNBOUNDED PRECEDING)`: NULL values don't advance the sum, and the
  * sum is NULL until the first non-NULL value has been seen.
  *
  * RECOMPUTE HAZARD (two jobs over one shuffle): correctness of the
  * pass-2 ordinals relies on pass 2 reading the SAME shuffle map output
  * pass 1 measured. Spark guarantees that while the shuffle files live;
  * if they are lost (executor decommission on a real cluster) the map
  * stage re-runs, and a NON-deterministic source could then shuffle
  * different partition contents than the offsets were computed from —
  * silently wrong ordinals. Every graft caller feeds deterministic
  * input (parquet scans + deterministic expressions), which makes the
  * recompute idempotent; callers with non-deterministic upstreams
  * (sampling without a seed, `rand()`) must checkpoint or persist their
  * input before calling this.
  */
object GlobalOrder {

  /** Result frame plus the totals the first pass already paid for
    * (driver-known, so callers don't re-aggregate for `count(*)`), and
    * the prefix-offset broadcast pass 2 reads. The broadcast is
    * reclaimed automatically by Spark's ContextCleaner once `df`'s
    * lineage is unreachable; callers that fully materialise `df`
    * inside their own scope (e.g. a terminal `.write`) can reclaim it
    * eagerly with [[Ordered.release]].
    */
  final case class Ordered(df: DataFrame, totalRows: Long, totalValue: Long,
      private[graft] val offsets: org.apache.spark.broadcast.Broadcast[_]) {
    /** Drop the offset broadcast's executor + driver copies NOW.
      * Only safe once `df` has been fully materialised (written,
      * collected, or persisted-and-counted): re-executing `df`'s plan
      * after release fails on the destroyed broadcast.
      */
    def release(): Unit = offsets.destroy()
  }

  /** Appends `ordName` (0-based global ordinal, LONG) and — when
    * `valueCol` is set — `cumName` (inclusive running sum of that LONG
    * column) to `df`, ordered by `sortExprs` (may include `.desc`; must
    * reach a total order for the result to be deterministic).
    *
    * `numPartitions <= 0` leaves the range partition count to
    * `spark.sql.shuffle.partitions`.
    */
  def withOrdinal(df: DataFrame, sortExprs: Seq[Column],
                  valueCol: Option[String] = None,
                  ordName: String = "ord", cumName: String = "cum_value",
                  numPartitions: Int = 0, pinInput: Boolean = true): Ordered = {
    require(sortExprs.nonEmpty, "need at least one order expression")
    val spark = df.sparkSession
    // A range exchange traverses its child up to THREE times before the
    // first byte of ordered output exists: the boundary sketch, an
    // imbalance re-sample, and the shuffle map write. When the child is
    // expensive to recompute (a projection that decodes a wide parquet
    // column, an explode lineage), those traversals triple its cost —
    // measured 21 s vs 8 s against the window twin on a 2.5M-doc corpus
    // whose child tokenizes the text column. Pin the (already projected,
    // narrow) input for the exchange's traversals and release it right
    // after pass 1: from there every job reads the shuffle map output,
    // not the child. Callers that persist their own input pass
    // `pinInput = false` (a second persist of the same plan would
    // no-op, but OUR unpersist would release THEIR cache).
    val pinned = if (pinInput) df.persist() else df
    // ALWAYS pass an explicit partition count: a number-less
    // repartitionByRange is fair game for AQE partition coalescing, and
    // on a corpus whose narrow shuffle rows fit the 64 MB advisory size
    // AQE collapses the range exchange to ONE partition — turning
    // sortWithinPartitions into exactly the single-task global sort this
    // operator exists to avoid (measured: 21 s vs 2 s on a 2.5M-row
    // corpus). A user-specified count is exempt from coalescing.
    val nParts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val parted0 = pinned.repartitionByRange(nParts, sortExprs: _*)
    val parted = parted0.sortWithinPartitions(sortExprs: _*)
    val schema = parted.schema
    val vIdx = valueCol.map { c =>
      val i = schema.fieldIndex(c)
      require(schema(i).dataType == LongType,
        s"value column '$c' must be LONG (got ${schema(i).dataType.sql})")
      i
    }
    // QueryExecution.toRdd is a lazy val: both jobs below hang off the
    // same shuffled RDD, so the range-exchange map output is computed
    // once and the second job's map stage is skipped. Working on
    // InternalRow keeps both passes inside Tungsten — no external-type
    // converters on the hot path (the Row-based form measured ~2× slower
    // at 500k rows).
    val rdd = parted.queryExecution.toRdd
    // pass 1: per-partition (rows, sum, non-null count) — bounded driver
    // traffic: numPartitions tuples of three longs. Reads primitives
    // only, before the reader reuses its row buffer — no copies.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cnt = 0L; var sum = 0L; var nn = 0L
      it.foreach { r =>
        cnt += 1
        vIdx.foreach { i => if (!r.isNullAt(i)) { sum += r.getLong(i); nn += 1 } }
      }
      Iterator((pid, cnt, sum, nn))
    }.collect()
    // pass 1 materialised the shuffle map output — every later job
    // (pass 2, caller re-executions) reads shuffle files, not the
    // child, so the input pin has served its purpose
    if (pinInput) pinned.unpersist(false)
    val nPart = rdd.getNumPartitions
    val cntOff = new Array[Long](nPart)
    val sumOff = new Array[Long](nPart)
    val nnOff = new Array[Long](nPart)
    var c = 0L; var s = 0L; var nnAcc = 0L
    stats.sortBy(_._1).foreach { case (pid, cnt, sum, nn) =>
      cntOff(pid) = c; sumOff(pid) = s; nnOff(pid) = nnAcc
      c += cnt; s += sum; nnAcc += nn
    }
    val sc = spark.sparkContext
    // one broadcast for all three offset arrays — a single handle for
    // the ContextCleaner / release() to reclaim
    val bcOff = sc.broadcast((cntOff, sumOff, nnOff))
    val outFields = schema.fields :+ StructField(ordName, LongType, nullable = false)
    val outSchema = StructType(
      if (vIdx.isDefined) outFields :+ StructField(cumName, LongType, nullable = true)
      else outFields)
    // pass 2: ordered sweep per partition, offsets added. A codegen'd
    // UnsafeProjection over (input row ++ ordinal/cumsum) emits fresh
    // UnsafeRows (copy: sort/reader buffers are reused under us).
    val nExtra = if (vIdx.isDefined) 2 else 1
    val outRdd: org.apache.spark.rdd.RDD[InternalRow] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val proj = UnsafeProjection.create(outSchema)
        val joined = new JoinedRow
        val extra = new GenericInternalRow(nExtra)
        val (cntA, sumA, nnA) = bcOff.value
        var ord = cntA(pid)
        var cum = sumA(pid)
        var seen = nnA(pid) > 0L
        it.map { r =>
          extra.update(0, ord)
          ord += 1
          vIdx.foreach { i =>
            if (!r.isNullAt(i)) { cum += r.getLong(i); seen = true }
            extra.update(1, if (seen) cum else null)
          }
          proj(joined(r, extra)).copy(): InternalRow
        }
      }
    Ordered(GraftBridge.internalCreateDataFrame(spark, outRdd, outSchema), c, s, bcOff)
  }
}
