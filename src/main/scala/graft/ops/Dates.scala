package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F5 (`etl.py:136-141`): the reference's SAS-date conversion — a double
  * holding days-since-1960-01-01 → ISO `yyyy-MM-dd` string, where null
  * AND zero both map to null (the reference's Python lambda treats 0 as
  * falsy, so 1960-01-01 itself becomes null; SURVEY §2 F5).
  *
  * The reference used a Python UDF (a codegen/pushdown barrier); here the
  * primary implementation is pure built-in Catalyst expressions
  * (`date_add` from a fixed epoch guarded by `when`), which stays inside
  * whole-stage codegen. A deliberate Scala `udf` twin covers the UDF
  * capability surface (SURVEY §7.2 step 3).
  */
object Dates {

  private val sasEpoch: Column = to_date(lit("1960-01-01"))

  /** days-since-1960 (int column) → ISO date string, null-and-zero rule. */
  def sasDaysToIso(days: Column): Column =
    when(days.isNull || days === 0, lit(null).cast("string"))
      .otherwise(date_format(date_add(sasEpoch, days.cast("int")), "yyyy-MM-dd"))

  /** Same semantics as a Scala UDF (deliberately kept: exercises the
    * UDF registration surface; not codegen'd — do not use in hot paths).
    */
  val sasDaysToIsoUdf = udf { (days: java.lang.Integer) =>
    if (days == null || days == 0) null
    else java.time.LocalDate.of(1960, 1, 1).plusDays(days.longValue()).toString
  }

  /** Round-trips l_shipdate through the SAS day-number representation:
    * derive days-since-1960 from the date, then convert back with the
    * null/zero rule — exercises F5 exactly over testdata.
    */
  def sasDateConvert(lineitem: DataFrame, useUdf: Boolean = false): DataFrame = {
    val days = datediff(col("l_shipdate").cast("date"), sasEpoch)
    val iso = if (useUdf) sasDaysToIsoUdf(days.cast("int")) else sasDaysToIso(days)
    lineitem.select(
      col("l_orderkey").as("order_key"),
      col("l_linenumber").as("line_number"),
      days.as("sas_days"),
      iso.as("ship_date_iso")
    ).orderBy("order_key", "line_number")
  }
}
