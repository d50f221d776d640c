package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic testdata (TESTDATA.md).
  *
  * One parquet file per table; paths are `dir/<name>.parquet` with
  * `dir` one of `/root/testdata/sf{0.001,0.01,0.1}`. Reads are plain
  * parquet scans so Catalyst's column pruning and filter pushdown reach
  * the file scan (check `PushedFilters`/`ReadSchema` in `.explain`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Normalize `events.ts` to session-TZ TimestampType (µs) across the
    * physical types the generator has produced over time:
    *  - TIMESTAMP(NANOS): Spark's TimestampType (µs) cannot represent
    *    it — Spark 4 rejects the file outright unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/
    *    Bench/test sessions). Read the long nanos and convert with
    *    integer division (a double-typed `/ 1000` would lose precision
    *    at 1.7e18).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, which time-zone-aware functions
    *    (`unix_micros`, `window`, watermarks) reject. Sessions here
    *    run with `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ
    *    cast relabels the same wall-clock instant as UTC — bit-exact
    *    with what DuckDB sees in the file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Recursively delete a scratch directory when the JVM exits — for
    * per-run export targets (keyed by applicationId, so concurrent runs
    * never share one) that the driver still reads back lazily after the
    * producing query returns.
    */
  def deleteOnExit(path: String): Unit = {
    val f = new java.io.File(path)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(x: java.io.File): Unit = {
        val kids = x.listFiles()
        if (kids != null) kids.foreach(rm)
        x.delete(): Unit
      }
      rm(f)
    }))
  }
}
