package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the CDC building block: classify every key across
  * two snapshots of a table as insert / delete / update / unchanged
  * and report per-class counts with an exact key-sum digest. One
  * full-outer join on the key decides every class; compared columns are
  * packed into a struct so the null-safe equality (`<=>`) is a single
  * nested compare regardless of column count.
  *
  * At scale both snapshots shuffle once on the key (or zero times if
  * both are bucketed by it); the output is one row per class.
  */
object Diff {

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    def packed(df: DataFrame, side: String): DataFrame =
      df.select(col(keyCol).as(s"${side}_k"),
        struct(compareCols.map(col): _*).as(s"${side}_v"))
    packed(oldSnap, "old")
      .join(packed(newSnap, "new"), col("old_k") === col("new_k"), "full_outer")
      .withColumn("change_type",
        when(col("old_k").isNull, "insert")
          .when(col("new_k").isNull, "delete")
          .when(col("old_v") <=> col("new_v"), "unchanged")
          .otherwise("update"))
      .groupBy("change_type").agg(
        count(lit(1)).as("n_keys"),
        sum(coalesce(col("old_k"), col("new_k"))).as("sum_keys"))
      .orderBy("change_type")
  }
}
