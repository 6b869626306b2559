package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-join shootout (manual; SURVEY §8): a fact table whose hot key
  * owns half the rows, joined to a 100k-row dimension too large to
  * broadcast at production scale (broadcast disabled to model that).
  * Three schedules over the identical join:
  *
  *   plain     — shuffle SMJ, AQE off: the hot key lands on ONE task
  *   aqe       — AQE skew-join split (thresholds lowered so the 10×
  *               local dataset trips the same code path a 100 TB run
  *               trips at defaults)
  *   salted 8/32 — [[graft.operators.Skew.saltedJoin]]
  *
  * Run with `sbt "Test/runMain graft.tools.SkewSoak"`.
  */
object SkewSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nFact = 5000000L
    val nKeys = 100000L
    // half the fact rows hit key 0; the rest spread uniformly
    val fact = spark.range(nFact).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("key"),
      col("id").as("row_id"),
      (col("id") % 1000).cast("double").as("v"))
      .localCheckpoint() // freeze input so every variant reads the same data
    val dim = spark.range(nKeys).select(col("id").as("key"),
      (col("id") % 25).as("grp")).localCheckpoint()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s (rows=$n)")
    }
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("grp").agg(sum("v")).count()

    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    conf.set("spark.sql.adaptive.enabled", "false")
    time("plain shuffle join, AQE off") {
      agg(fact.join(dim, "key"))
    }

    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    time("AQE skew-join split") {
      agg(fact.join(dim, "key"))
    }

    conf.set("spark.sql.adaptive.enabled", "false")
    for (factor <- Seq(8, 32))
      time(s"salted join, factor $factor") {
        agg(graft.operators.Skew.saltedJoin(
          fact, dim, "key", col("row_id"), factor))
      }

    // sanity: identical results across schedules
    conf.set("spark.sql.adaptive.enabled", "true")
    val plain = fact.join(dim, "key").groupBy("grp")
      .agg(sum("v").as("s")).orderBy("grp").collect()
    val salted = graft.operators.Skew
      .saltedJoin(fact, dim, "key", col("row_id"), 8)
      .groupBy("grp").agg(sum("v").as("s")).orderBy("grp").collect()
    require(plain.sameElements(salted), "schedules disagree!")
    println("results identical across schedules")
    spark.stop()
  }
}
