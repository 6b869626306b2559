package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for SHUFFLE-FREE fact joins — the storage-side
  * counterpart of [[Skew]]'s runtime mitigation.
  *
  * At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling
  * both sides on the key. Writing each table bucketed on its join key
  * (hash(key) mod n files per partition, Spark's native bucketing)
  * moves that shuffle to WRITE TIME, once, and every subsequent join or
  * aggregation on the key reads co-located buckets: the join plans with
  * zero Exchange, and with `sortBy` the per-bucket sort is prepaid too.
  * The standard layout decision for tables joined repeatedly on a
  * stable key (orders⋈lineitem, events by user) — pay one shuffle at
  * ingest, amortize it over every downstream query.
  *
  * Rules the helper encodes:
  *  - bucket counts must MATCH on both sides (or divide evenly) for the
  *    exchange to be elided — callers pick one corpus-wide constant per
  *    key domain;
  *  - bucket by the JOIN key, sort by (join key + frequent range key);
  *  - one file per bucket per write task — repartition on the bucket
  *    key first so a 1000-task ingest doesn't emit 1000×n small files
  *    (the same small-files rule as `Curation.writeCorpus`).
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and sorted) on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(buckets, df(key))
      .write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** The two bucketed sides joined on their bucket keys. Plain
    * `.join` — the point is what Catalyst does with it: both sides
    * report `HashPartitioning(key, n)` from the file scan, so
    * `EnsureRequirements` inserts no Exchange.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
