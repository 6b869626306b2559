package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.filters.FilterRegistry

/** Alert-schema handling — SURVEY §1.2/§3.1.
  *
  * The engine is deliberately SCHEMA-ON-READ: the parquet footer of an
  * alert batch is the authoritative, versioned schema contract (the
  * version rides in-band — `schemavsn` for ZTF, `lsst_schema_version`
  * for Rubin), and a hand-maintained StructType literal would silently
  * drift from survey schema releases. What the engine adds on top:
  *
  *  - [[fromSample]] captures a batch's schema for the streaming
  *    source, which requires an explicit schema up front
  *    ([[graft.streaming.StreamPipeline.readParquetStream]]);
  *  - [[missingColumns]]/[[validate]] is the PRE-FLIGHT analog of the
  *    reference's name-based binding step (§3.1 "Bind": UDF parameter
  *    names resolved against column names at call time) — resolve
  *    every column a filter declares against a schema and report the
  *    gaps before execution, instead of an AnalysisException somewhere
  *    mid-plan.
  */
object AlertSchemas {

  /** Schema of a sample alert batch (the streaming-source contract). */
  def fromSample(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  /** Can `dottedPath` (e.g. "candidate.jd", "prv_candidates.magpsf")
    * resolve against the schema? Arrays of structs descend into the
    * element type, mirroring Spark's own resolution; field-name
    * matching is case-insensitive like the default analyzer.
    */
  def resolvable(schema: StructType, dottedPath: String): Boolean = {
    def descend(t: org.apache.spark.sql.types.DataType,
        parts: List[String]): Boolean = parts match {
      case Nil => true
      case p :: rest => t match {
        case s: StructType =>
          s.fields.find(_.name.equalsIgnoreCase(p)) match {
            case Some(f) => descend(f.dataType, rest)
            case None => false
          }
        case ArrayType(el, _) => descend(el, p :: rest)
        case _ => false
      }
    }
    descend(schema, dottedPath.split('.').toList)
  }

  /** The declared columns of `filterName` that do NOT resolve against
    * the schema (empty = the filter can bind).
    */
  def missingColumns(schema: StructType, filterName: String): Seq[String] =
    FilterRegistry.get(filterName).requiredColumns
      .filterNot(resolvable(schema, _))

  /** Pre-flight check: fail fast (with every unresolvable column named)
    * before running a filter against an incompatible batch.
    */
  def validate(df: DataFrame, filterName: String): Unit = {
    val missing = missingColumns(df.schema, filterName)
    require(missing.isEmpty,
      s"filter '$filterName' cannot bind: missing columns " +
        missing.mkString(", "))
  }
}
