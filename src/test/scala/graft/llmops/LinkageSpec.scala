package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Symmetric-delete blocking correctness: the deletion neighborhood
  * matches a driver-side brute force, and the blocked+verified fuzzy
  * join equals the naive all-pairs Levenshtein join on randomized
  * vocabularies (the completeness property the q92 oracle certifies on
  * the real part names).
  */
class LinkageSpec extends SparkSpec {

  private def driverDeletions(s: String, maxDist: Int): Set[String] = {
    def delOne(xs: Set[String]): Set[String] =
      xs.flatMap(x => x.indices.map(i => x.take(i) + x.drop(i + 1)))
    var acc = Set(s)
    var frontier = Set(s)
    for (_ <- 1 to maxDist) {
      frontier = delOne(frontier)
      acc ++= frontier
    }
    acc
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletionVariants equals the driver brute force (k = 1 and 2)") {
    import spark.implicits._
    val samples = Seq("", "a", "ab", "abc", "cold anvil", "x y", "aaaa")
    for (k <- Seq(1, 2)) {
      val got = samples.toDF("s")
        .select(col("s"), Linkage.deletionVariants(col("s"), k).as("v"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1))
        .toMap
      samples.foreach { s =>
        assert(got(s).toSet === driverDeletions(s, k), s"string '$s' k=$k")
        assert(got(s).distinct.size === got(s).size, s"dupes for '$s'")
      }
    }
  }

  test("fuzzyNamePairs equals naive all-pairs on a random vocabulary") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    // small alphabet forces dense near-miss structure
    val vocab = (1 to 80).map(_ =>
      (0 until (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString).distinct
    for (k <- Seq(1, 2)) {
      val got = Linkage.fuzzyNamePairs(vocab.toDF("name"), "name", k)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val want = (for {
        a <- vocab; b <- vocab if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d)).toSet
      assert(got === want, s"k=$k")
      assert(want.nonEmpty, "randomized fixture degenerate (no pairs)")
    }
  }

  test("fuzzyNamePairs fails loudly past maxLen instead of building a len^2 index") {
    import spark.implicits._
    // a multi-KB key would materialize millions of deletion-variant
    // slots per row at k=2 — the guard must raise, not drop or OOM
    val long = "x" * 5000
    val df = Seq("short", long).toDF("name")
    val ex = intercept[Exception] {
      Linkage.fuzzyNamePairs(df, "name", maxDist = 2).collect()
    }
    assert(ex.getMessage.contains("maxLen") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxLen")),
      ex.getMessage)
    // under the limit nothing changes
    assert(Linkage.fuzzyNamePairs(
      Seq("abc", "abd").toDF("name"), "name", 1).count() === 1L)
  }

  test("q92 gate: 24 near-miss name pairs, counts join back exactly") {
    val out = Linkage.qFuzzyJoin(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 24)
    assert(out.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 2))
    // the cold/old family is distance 1; every pair carries positive counts
    assert(out.count(_.getInt(2) == 1) === 8)
    assert(out.forall(r => r.getLong(3) > 0 && r.getLong(4) > 0))
  }
}
