package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector for the driver-contract queries: prints the formatted
  * (pre-execution) plan and, after running the query, the AQE-final
  * executed plan — the loop used to verify broadcasts, pushed filters,
  * shuffle counts, and codegen spans per operator.
  *
  * Usage: PlanDump <query_name> [sfDir]   (defaults to sf0.01)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: PlanDump <query> [sfDir]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = fn(spark, sfDir)
    println(s"=== $name: formatted plan (pre-AQE) ===")
    df.explain("formatted")
    val n = df.count()
    println(s"=== $name: executed plan after AQE (rows=$n) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
