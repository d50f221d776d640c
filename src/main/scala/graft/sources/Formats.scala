package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format helpers (SURVEY §2 A/G): the pluggable
  * `format(...)` scan mechanism the reference uses for its SAS connector
  * (`etl.py:103-107,227`), exercised over the formats available in this
  * environment — parquet, csv, json, orc — plus partitioned variants.
  *
  * Rule of thumb encoded here: columnar formats (parquet/orc) carry
  * their own schema and support predicate pushdown + column pruning;
  * text formats (csv/json) get an EXPLICIT schema on read — schema
  * inference is a full extra pass over 100 TB and is never acceptable
  * at scale.
  */
object Formats {

  def write(df: DataFrame, path: String, format: String,
            partitionBy: Seq[String] = Nil, options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode("overwrite").format(format).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** Schema-explicit read — `schema` is required for text formats. */
  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.fold(r)(r.schema).load(path)
  }

  /** Bucketed table write: pre-shuffles into `numBuckets` by `bucketCol`
    * so future equi-joins/aggregations on that key are exchange-free —
    * the co-located-join primitive for repeated joins at scale. Requires
    * the session catalog (`saveAsTable`).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
