package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffle joins — the manual counterpart
  * to AQE's runtime skew-join split (`spark.sql.adaptive.skewJoin`),
  * for when the skew is KNOWN ahead of time (a hot user, a stopword
  * term, a null-heavy key) and the plan must not depend on runtime
  * replanning: the big side salts its key into `factor` subkeys, the
  * small side replicates every row across all `factor` subkeys, and
  * the join runs on (key, salt) — so a hot key's rows spread over
  * `factor` reducers instead of one straggler task.
  *
  * The salt is DETERMINISTIC (hash of a designated column, not rand()):
  * results are reproducible and retries/speculative tasks can't
  * disagree. Cost: the small side shuffles `factor`× — the standard
  * trade, chosen only when the small side is orders of magnitude
  * smaller (else broadcast it and skew is moot).
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, salted `factor` ways.
    * `saltSource` must be a column of `big` that varies within a key
    * group (e.g. the row's unique id) — it only seeds the spread.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** q72 — the salted join as an oracle-gated query: per-nation
    * revenue through a lineitem ⋈ supplier SALTED 8 ways (shuffle
    * join forced — broadcast disabled would be the production setting
    * for this shape; here the salt itself widens the key space so the
    * planner's choice is exercised on (key, salt)). The DuckDB oracle
    * runs the PLAIN join — the hash-match is the proof that salting
    * changes the schedule, never the result (the property SkewSpec
    * pins row-wise, restated here value-exactly through the gate).
    */
  def q72SaltedJoin(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = CoreQueries.table(spark, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    val supp = CoreQueries.table(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    saltedJoin(li, supp, "suppkey", col("l_orderkey"), factor = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("s_nationkey")
  }
}
