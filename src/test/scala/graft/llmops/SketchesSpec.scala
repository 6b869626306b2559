package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error contracts of the approximate sketches vs exact counts on the
  * fixture corpus — and the merge property that makes sketches the
  * right state for rolling profiles.
  */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val events = graft.operators.CoreQueries.events(spark, dir)

  test("HLL per-key distinct estimates track exact within 5%") {
    val est = Sketches
      .hllDistinctPerKey(events, "event_type", "user_id")
      .select("event_type", "distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex) <= math.max(2L, (ex * 0.05).toLong),
        s"$k: est ${est(k)} vs exact $ex")
    }
  }

  test("HLL sketches merge: daily union == whole-corpus estimate") {
    // split events into two halves (the 'two days'), sketch each, merge
    val withDay = events.withColumn("half",
      (col("event_id") % 2).cast("int"))
    val daily = Sketches.hllDistinctPerKey(
      withDay.withColumn("k", lit("all")), "k", "user_id")
    val perHalf = withDay.groupBy("half")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("hll"))
      .withColumn("k", lit("all"))
    val merged = Sketches.hllMergeEstimate(perHalf, "k")
      .select("distinct_est").head().getLong(0)
    val whole = daily.select("distinct_est").head().getLong(0)
    // identical sketch parameters + union => identical estimate
    assert(merged === whole)
  }

  test("CMS never undercounts; overcount bounded on the token corpus") {
    val cms = Sketches.tokenCms(docs)
    val exact = docs
      .select(explode(
        graft.expressions.WordShingles.shingles(col("text"), 1)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val est = Sketches.cmsEstimate(cms, exact.keys.toSeq)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t undercounted: ${est(t)} < $c")
      assert(est(t) <= c + math.max(4L, (n * 0.001).toLong),
        s"$t overcounted: ${est(t)} vs $c (n=$n)")
    }
  }

  test("KLL per-key quantiles track exact ranks within the k=200 bound") {
    val ev = graft.operators.CoreQueries
      .events(spark, "/root/testdata/sf0.01")
      .filter(col("value").isNotNull)
    val sketches = Sketches.kllPerKey(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("kll")).toMap
    val values = ev.select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((key, sorted) <- values; q <- Seq(0.5, 0.9, 0.99)) {
      val est = Sketches.kllQuantiles(sketches(key), Seq(q)).head
      // rank of the estimate must be within ~2x the 1.65% rank error
      val rank = sorted.count(_ <= est).toDouble / sorted.length
      assert(math.abs(rank - q) < 0.033,
        s"$key p$q: est=$est realized rank=$rank")
    }
  }

  test("KLL sketches merge: daily profiles == whole-stream quantiles") {
    val ev = graft.operators.CoreQueries
      .events(spark, "/root/testdata/sf0.01")
      .filter(col("value").isNotNull)
      .withColumn("day", to_date(col("ts")))
    // per-(type, day) sketches — the stored daily profile...
    val daily = Sketches.kllPerKey(
      ev.withColumn("event_type",
        concat_ws("|", col("event_type"), col("day"))),
      "event_type", "value")
      .withColumn("event_type",
        split(col("event_type"), "\\|").getItem(0))
    // ...merged per type without re-reading events
    val merged = Sketches.kllMerge(daily, "event_type")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("kll")).toMap
    val whole = Sketches.kllPerKey(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("kll")).toMap
    // merge changes internal compaction state, so estimates may differ
    // slightly from the single-pass sketch — both must sit inside the
    // same rank-error envelope around the exact quantile
    val values = ev.select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((key, sorted) <- values; q <- Seq(0.5, 0.9)) {
      val em = Sketches.kllQuantiles(merged(key), Seq(q)).head
      val ew = Sketches.kllQuantiles(whole(key), Seq(q)).head
      val rm = sorted.count(_ <= em).toDouble / sorted.length
      val rw = sorted.count(_ <= ew).toDouble / sorted.length
      assert(math.abs(rm - q) < 0.033, s"$key merged p$q rank=$rm")
      assert(math.abs(rw - q) < 0.033, s"$key whole p$q rank=$rw")
    }
  }
}
