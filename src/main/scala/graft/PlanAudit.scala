package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: sweeps every registered query's physical plan for
  * Filters whose condition inlines heavy derived expressions — the
  * constraint-inference cliff found (and fixed) in the IVF index paths
  * in round 12: a join key derived from a big expression gets an
  * inferred isnotnull pushed below the aggregate as a per-input-row
  * Filter, and the blown-up stage falls out of whole-stage codegen.
  * Planning only, no execution; run per round after adding join-heavy
  * operators. Flagged hits need adjudication, not automatic fixing —
  * a heavy condition short-circuiting behind a cheap guard (e.g.
  * `vec_id < 10 AND size(<22k-char probes expr>)`) or running on a
  * bounded row count is fine.
  *
  * Usage: java -cp ... graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    var total = 0; var maxLen = 0; val heavy = Seq("array_max(array(struct", "transform(", "aggregate(",
      "zip_with(", "filter(", "array_sort(")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      try {
        val df = f(spark, sf)
        def walk(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = {
          val inner: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
            case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              Seq(c.relation.cachedPlan)
            case _ => Nil
          }
          p +: (p.children ++ inner).flatMap(walk)
        }
        val conds = walk(df.queryExecution.executedPlan).collect {
          case fe: org.apache.spark.sql.execution.FilterExec => fe.condition.toString
        }
        conds.foreach { c =>
          total += 1; if (c.length > maxLen) maxLen = c.length
          val hits = heavy.filter(c.contains)
          if (hits.nonEmpty && c.length > 150)
            println(s"[audit] $name len=${c.length} hits=${hits.mkString(",")} :: ${c.take(160)}")
        }
        // the Generate variant of the same cliff (round 15): a heavy
        // expression in the Project directly ABOVE a Generate re-runs
        // once per EXPLODED row (dim x per vector for a posexplode) —
        // a select that mixes a generator with heavy expressions puts
        // them there. Measured 64 encodes/vector = 20x a Lloyd round
        // before the pqLloydCodebook fix. Flag heavy projections over
        // Generate for adjudication (attribute pass-throughs are fine).
        // a codegen boundary (InputAdapter / WholeStageCodegenExec) may
        // sit between the Project and the Generate — unwrap transparent
        // wrappers so the pattern is caught in codegen-disabled runs too
        def unwrapped(p: org.apache.spark.sql.execution.SparkPlan)
            : org.apache.spark.sql.execution.SparkPlan = p match {
          case w: org.apache.spark.sql.execution.InputAdapter => unwrapped(w.child)
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => unwrapped(w.child)
          case other => other
        }
        walk(df.queryExecution.executedPlan).foreach {
          case pe: org.apache.spark.sql.execution.ProjectExec
              if unwrapped(pe.child)
                .isInstanceOf[org.apache.spark.sql.execution.GenerateExec] =>
            pe.projectList.map(_.toString).foreach { p =>
              val hits = heavy.filter(p.contains)
              if (hits.nonEmpty && p.length > 150)
                println(s"[audit-gen] $name len=${p.length} hits=${hits.mkString(",")} :: ${p.take(160)}")
            }
          case _ =>
        }
      } catch {
        case e: Throwable => println(s"[audit-err] $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"[audit] done total-filters=$total maxlen=$maxLen")
    spark.stop()
  }
}
