package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ANALYZE-style statistics surface
  * (null counts, exact cardinalities, min/max) that layout decisions
  * (z-order key domains, bucket counts), skew diagnosis (salting
  * factors) and optimizer statistics all read. One row per profiled
  * column.
  *
  * Scale notes: the exact form unions one single-COLUMN aggregation
  * per profiled column — each branch's parquet scan prunes to exactly
  * that column (total I/O = one full-width scan, PlanSpec-pinned) and
  * shuffles that column's partial-deduped values, avoiding the
  * |rows| × |cols| Expand a single multi-count(DISTINCT) aggregation
  * plans. Exact distincts still shuffle ~the column's cardinality
  * per column — that is the exact contract's price (and what the
  * DuckDB gate can replay); at 100 TB profile with
  * [[tableProfileApprox]] instead — HLL sketch state per column,
  * map-side partials only — and accept the documented ~2% standard
  * error (sketch implementations differ across engines, so the approx
  * form is spec-bounded against exact rather than oracle-gated).
  */
object Profile {

  private def profileExprs(c: String,
      distinct: Column): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    count(when(col(c).isNull, 1)).as("n_nulls"),
    distinct.as("n_distinct"),
    // min/max serialized as strings so one schema carries every
    // column type; keep gate columns to types with engine-stable
    // string forms (integers, strings, dates — not doubles)
    min(col(c)).cast("string").as("min_val"),
    max(col(c)).cast("string").as("max_val"))

  /** Exact profile of `cols`: (column, n_rows, n_nulls, n_distinct,
    * min_val, max_val). NULLs are excluded from n_distinct (both
    * engines' count(DISTINCT) semantics) and ignored by min/max.
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    cols.map { c =>
      val es = profileExprs(c, count_distinct(col(c)))
      df.agg(es.head, es.tail: _*)
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
      .orderBy("column")
  }

  /** The 100 TB form: approx_count_distinct (HLL, single scan, no
    * Expand) with the same output schema. ProfileSpec bounds its
    * relative error against [[tableProfile]]. */
  def tableProfileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      val es = profileExprs(c, approx_count_distinct(col(c), rsd))
      df.agg(es.head, es.tail: _*)
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
      .orderBy("column")
  }

  /** q106 — exact profile of lineitem's engine-stable columns (bigint
    * keys, int, strings, plus the ship timestamp profiled at DAY grain
    * via a derived date-string column; doubles excluded — their string
    * forms are not engine-portable). The mirror computes the same five
    * statistics per column with a UNION ALL.
    */
  val Q106Cols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_returnflag", "l_linestatus", "l_shipday")

  def q106TableProfile(spark: SparkSession, dir: String): DataFrame =
    tableProfile(
      CoreQueries.table(spark, dir, "lineitem")
        .withColumn("l_shipday",
          col("l_shipdate").cast("date").cast("string")),
      Q106Cols)
}
