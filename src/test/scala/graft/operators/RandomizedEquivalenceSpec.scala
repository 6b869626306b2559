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

  test("semanticDedup == driver brute force of the same rule on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 2) {
      val n = 180 + rnd.nextInt(60) // ≥2 every-97th seeds
      val dim = 8
      val vecs = Seq.tabulate(n)(i =>
        (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
      val theta = 0.2
      val out = graft.llmops.Dedup.semanticDedup(
        vecs.toDF("vec_id", "embedding"), threshold = theta)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted
      // driver replica: argmax-cosine cell assignment (tie: smallest
      // seed id), then the greedy min-id rule within each cell
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val den = math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum)
        if (den > 0) dot / den else 0.0
      }
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val seeds = vecs.filter(_._1 % 97 == 0)
      val cellOf = vecs.map { case (id, e) =>
        id -> seeds.map { case (sid, se) => (cos(e, se), sid) }
          .minBy { case (c, sid) => (-c, sid) }._2
      }.toMap
      val expected = vecs.flatMap { case (b, eb) =>
        val quals = vecs.filter { case (a, ea) =>
          a < b && cellOf(a) == cellOf(b) && r6(cos(ea, eb)) >= theta
        }
        if (quals.isEmpty) None
        else Some((b, quals.map(_._1).min, quals.size.toLong))
      }.sorted
      assert(out.toSeq === expected,
        s"trial $trial: ${out.length} vs ${expected.length} dropped")
      assert(out.nonEmpty, s"trial $trial produced no pairs at θ=$theta")
    }
  }
}
