package graft.filters

import org.apache.spark.sql.{Column, DataFrame}

/** One boolean predicate over an alert DataFrame — the engine's core
  * abstraction, mirroring the reference's execution contract (alert
  * DataFrame in → boolean mask → `df.filter(mask)` → reduced DataFrame
  * out; see `apply_user_defined_filter` usage at
  * `fink_filters/ztf/livestream/filter_sn_candidates/filter.py:125-130`).
  *
  * Where the reference binds a pandas UDF's parameter names to column names
  * and ships batches to Python workers over Arrow, an [[AlertFilter]] is a
  * pure Catalyst `Column` builder: no process boundary, no serialization,
  * whole-stage codegen end to end.
  */
trait AlertFilter {
  /** Registry key, e.g. "ztf.livestream.sn_candidates". */
  def name: String

  /** Human description (the reference's Rubin modules export a DESCRIPTION
    * constant — `filter_uniform_sample/filter.py:19-20`).
    */
  def description: String = ""

  /** Whether passing alerts should be persisted to the archive store —
    * metadata parity with the reference's per-module HBASE_SUPPORT
    * constant (`filter_uniform_sample/filter.py:20`).
    */
  def archiveSupport: Boolean = true

  /** Top-level / dotted-path columns the mask reads (used for pruning
    * checks and documentation; Catalyst prunes automatically).
    */
  def requiredColumns: Seq[String]

  /** The boolean mask. Takes the DataFrame so filters that need derived
    * columns (history concat, cross-match flags) can build them; pure
    * predicates ignore the argument.
    */
  def mask(df: DataFrame): Column

  /** Apply: identical semantics to the reference's
    * `df.filter(udf(*cols))`.
    */
  def apply(df: DataFrame): DataFrame = df.filter(mask(df))
}

/** String-keyed filter registry — the engine analog of the reference's
  * "dotted module path → function" dispatch (importlib-based, see
  * `fink_utils` `apply_user_defined_filter`). Config files can keep
  * addressing filters by name.
  */
object FilterRegistry {
  @volatile private var filters: Map[String, AlertFilter] = Map.empty

  def register(fs: AlertFilter*): Unit = synchronized {
    filters = filters ++ fs.map(f => f.name -> f)
  }

  /** Register a raw Spark-SQL predicate under a name — the engine analog
    * of the reference's SQL-string filters (O4:
    * `df_proc.filter("dec <= 20 AND …")`, user `custom_filter` —
    * `filter_anomaly_notification/filter.py:161-166`). Broker configs
    * can ship ad-hoc predicates without code.
    */
  def registerSql(filterName: String, sqlPredicate: String,
      desc: String = ""): AlertFilter = {
    val f = new AlertFilter {
      val name = filterName
      override val description =
        if (desc.nonEmpty) desc else s"SQL filter: $sqlPredicate"
      val requiredColumns = Seq.empty
      def mask(df: DataFrame): Column =
        org.apache.spark.sql.functions.expr(sqlPredicate)
    }
    register(f)
    f
  }

  def all: Map[String, AlertFilter] = {
    ensureLoaded()
    filters
  }

  def get(name: String): AlertFilter =
    all.getOrElse(name,
      throw new NoSuchElementException(
        s"unknown filter '$name'; known: ${all.keys.toSeq.sorted.mkString(", ")}"))

  /** `apply_user_defined_filter(df, name)` equivalent. */
  def applyFilter(df: DataFrame, name: String): DataFrame = get(name)(df)

  // Touch the filter modules so their `register` side effects run.
  private def ensureLoaded(): Unit = {
    graft.filters.ztf.ZtfFilters.load()
    graft.filters.ztf.ZtfHistoryFilters.load()
    graft.filters.ztf.ZtfPhotometryFilters.load()
    graft.filters.ztf.ZtfHostlessFilters.load()
    graft.filters.ztf.MmFilters.load()
    graft.filters.ztf.ZtfXmatchFilters.load()
    graft.filters.ztf.EarlyKnFilter.load()
    graft.filters.ztf.EarlyTdeScorer.load()
    graft.filters.rubin.RubinFilters.load()
    graft.classify.Classify.load()
  }
}
