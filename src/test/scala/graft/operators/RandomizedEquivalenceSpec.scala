package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized equivalence properties for the rewritten operators: the
  * optimized formulation must equal the naive one on arbitrary inputs,
  * not just the fixture's data shape (seeded generators — failures
  * reproduce).
  */
class RandomizedEquivalenceSpec extends SparkSpec {

  test("intervalJoin == naive inequality join on random event streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 150 + rnd.nextInt(100)
      val mk = (i: Int) => (i.toLong, rnd.nextInt(8).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(48 * 3600) * 1000L))
      val left = Seq.tabulate(n)(mk)
        .toDF("lid", "k", "lts")
      val right = Seq.tabulate(n)(i => mk(i + 10000))
        .toDF("rid", "k2", "rts")
      val win = 3600L
      val fast = EventQueries.intervalJoin(
        left, right.withColumnRenamed("k2", "k"), "k", "lts", "rts", win)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val naive = left.join(right,
          col("k") === col("k2") &&
            col("rts") <= col("lts") &&
            col("rts") >= to_timestamp(
              unix_micros(col("lts")).minus(win * 1000000L) / 1000000.0))
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(fast.toSeq === naive.toSeq,
        s"trial $trial: ${fast.length} vs ${naive.length} pairs")
    }
  }

  test("ZonePruneRule preserves match sets on random skies") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    try {
      val rnd = new scala.util.Random(13)
      val pts = Seq.fill(300)((rnd.nextDouble() * 360.0,
        rnd.nextDouble() * 180.0 - 90.0)).zipWithIndex
        .map { case ((ra, dec), i) => (i.toLong, ra, dec) }
        .toDF("id", "ra", "dec")
      val cat = Seq.fill(10)((rnd.nextDouble() * 360.0,
        rnd.nextDouble() * 180.0 - 90.0)).zipWithIndex
        .map { case ((ra, dec), i) => (i.toLong, ra, dec) }
        .toDF("cid", "cra", "cdec")
      val sep = graft.astro.Astro.angSepDeg(
        col("ra"), col("dec"), col("cra"), col("cdec"))
      // rule-injected prune vs the rule-free cross product + filter
      val pruned = pts.join(broadcast(cat), sep < 20.0)
        .select("id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val reference = pts.crossJoin(broadcast(cat))
        .filter(graft.astro.Astro.angSepDeg(
          col("ra"), col("dec"), col("cra"), col("cdec")) < 20.0)
        .select("id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(pruned.toSeq === reference.toSeq)
      assert(pruned.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.ZonePruneRule)
    }
  }
}
