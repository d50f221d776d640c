package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching / entity resolution: find pairs of distinct
  * attribute values within a Levenshtein-distance threshold — the
  * record-linkage step (dirty catalogs, misspelled names) done as a
  * BLOCKED self-join, never the full cross product.
  *
  * Blocking here: equi-join on the first character plus a length-delta
  * cap (an edit can change length by at most 1 per operation, so
  * |len(a)-len(b)| > maxDist can never match — the cap below is tighter
  * still and part of the operator's declared recall contract, as is
  * missing pairs that differ in their first character: standard
  * blocking trade-offs, shared by the oracle twin). At 100 TB the same
  * shape holds with a stronger key (length bucket × prefix-2) or
  * sorted-neighborhood windows; the pairwise distance only ever runs
  * within a block.
  *
  * Distinct values are weighted by their row counts first, so the
  * quadratic step is over the (much smaller) value domain, not rows.
  */
object Fuzzy {

  def fuzzyNameMatch(df: DataFrame, nameCol: String, maxDist: Int = 3,
                     maxLenDelta: Int = 2): DataFrame = {
    val names = df.groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n_rows"))
    val a = names.select(col("name").as("name_a"), col("n_rows").as("n_rows_a"),
      substring(col("name"), 1, 1).as("blk"))
    val b = names.select(col("name").as("name_b"), col("n_rows").as("n_rows_b"),
      substring(col("name"), 1, 1).as("blk"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxLenDelta)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_rows_a", "n_rows_b")
      .orderBy("name_a", "name_b")
  }
}
