package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.expressions.{SimHash64, WordShingles}
import graft.llmops.Similarity

/** The SQL function surface must evaluate through the same kernels as
  * the Column API — each function is checked SQL-vs-Column on real
  * fixture data.
  *
  * `register` now also mutates the session OPTIMIZER (ZonePruneRule);
  * the suite removes the rule again in afterAll so plan-sensitive
  * suites sharing `SparkSpec.session` see the same optimizer whether
  * or not this suite ran before them (no test-order dependence).
  */
class ExtensionsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  GraftExtensions.register(spark)

  override protected def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(r => r == graft.plans.ZonePruneRule ||
          r == graft.plans.BoundedEditDistanceRule)
    super.afterAll()
  }

  private lazy val docs = {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("ext_docs")
    spark.table("ext_docs")
  }
  private lazy val emb = {
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("ext_emb")
    spark.table("ext_emb")
  }

  test("word_shingles SQL == Column kernel (default and n=1)") {
    docs // force view
    val cmp = spark.sql(
      """SELECT word_shingles(text) AS s3, word_shingles(text, 1) AS s1,
        |  text FROM ext_docs""".stripMargin)
      .withColumn("c3", WordShingles.shingles(col("text")))
      .withColumn("c1", WordShingles.shingles(col("text"), 1))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("s3") =!= col("c3") ||
      col("s1") =!= col("c1")).count() === 0L)
  }

  test("simhash64 and minhash_signature SQL == Column kernels") {
    docs
    val cmp = spark.sql(
      """SELECT text,
        |  simhash64(word_shingles(text, 1)) AS sh,
        |  minhash_signature(array_distinct(word_shingles(text))) AS mh
        |FROM ext_docs""".stripMargin)
      .withColumn("csh", SimHash64.simhash(WordShingles.shingles(col("text"), 1)))
      .withColumn("cmh", graft.expressions.MinHashSignature.signature(
        array_distinct(WordShingles.shingles(col("text"))), 16))
    assert(cmp.filter(col("sh") =!= col("csh") ||
      col("mh") =!= col("cmh")).count() === 0L)
  }

  test("dot_product and winnow_fingerprints SQL == Column kernels") {
    emb
    val d = spark.sql(
      "SELECT dot_product(embedding, embedding) AS dd, embedding FROM ext_emb")
      .withColumn("cd", Similarity.dot(col("embedding"), col("embedding")))
    assert(d.filter(col("dd") =!= col("cd")).count() === 0L)
    docs
    val w = spark.sql(
      "SELECT winnow_fingerprints(word_shingles(text)) AS fp, text FROM ext_docs")
      .withColumn("cfp", graft.expressions.WinnowFingerprints.winnow(
        WordShingles.shingles(col("text")), 4))
    assert(w.filter(col("fp") =!= col("cfp")).count() === 0L)
  }

  test("intersect_count SQL == Column kernel == builtin on shingle sets") {
    docs
    val cmp = spark.sql(
      """SELECT doc_id,
        |  transform(array_distinct(word_shingles(text)), s -> xxhash64(s))
        |    AS sh
        |FROM ext_docs""".stripMargin)
      .select(col("doc_id"), col("sh"),
        reverse(col("sh")).as("rsh"), slice(col("sh"), 1, 5).as("psh"))
    val checked = cmp.select(
      graft.expressions.IntersectCount.intersectCount(col("sh"), col("rsh"))
        .as("self"),
      size(col("sh")).cast("long").as("n"),
      graft.expressions.IntersectCount.intersectCount(col("sh"), col("psh"))
        .as("part"),
      size(array_intersect(col("sh"), col("psh"))).cast("long").as("bpart"))
    // order-insensitive full self-overlap + builtin equivalence
    assert(checked.filter(col("self") =!= col("n") ||
      col("part") =!= col("bpart")).count() === 0L)
    cmp.createOrReplaceTempView("ext_ic")
    val viaSql = spark.sql(
      "SELECT intersect_count(sh, psh) AS s FROM ext_ic")
      .collect().map(_.getLong(0))
    val viaCol = checked.select("part").collect().map(_.getLong(0))
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("mode_count SQL == Column kernel == grouped counts") {
    docs
    val cmp = spark.sql(
      """SELECT doc_id, mode_count(word_shingles(text, 2)) AS m, text
        |FROM ext_docs""".stripMargin)
      .withColumn("c", graft.expressions.ModeCount.modeCount(
        graft.expressions.WordShingles.shingles(col("text"), 2)))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("m") =!= col("c")).count() === 0L)
    // mode_count rejects non-string arrays at analysis time
    val e = intercept[Exception] {
      spark.sql("SELECT mode_count(array(1L, 2L)) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("array<string>"), e.getMessage)
  }

  test("sparse_dot_micros SQL == Column kernel on constructed vectors") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 5L, 9L), Seq(1000000L, 2000000L, 500000L),
        Seq(1L, 9L), Seq(3000000L, 4000000L)),
      (Seq(2L), Seq(7L), Seq(3L), Seq(11L))) // disjoint
      .toDF("ak", "av", "bk", "bv")
    df.createOrReplaceTempView("ext_sparse")
    val cmp = spark.sql(
      "SELECT sparse_dot_micros(ak, av, bk, bv) AS s FROM ext_sparse")
      .collect().map(_.getDouble(0))
    val col0 = df.select(graft.expressions.SparseDotMicros
        .sparseDotMicros(col("ak"), col("av"), col("bk"), col("bv")))
      .collect().map(_.getDouble(0))
    assert(cmp.toSeq === col0.toSeq)
    assert(cmp(0) === 5.0) // (1e6·3e6 + 5e5·4e6)·1e-12 = (3e12+2e12)·1e-12
    assert(cmp(1) === 0.0)
  }

  test("sign_bands, constellation_of, rainbow_fit SQL == Column kernels") {
    import spark.implicits._
    // sign_bands over constructed sparse vectors
    val sv = Seq((Seq(1L, 5L, 9L), Seq(1000000L, 2000000L, 500000L)),
      (Seq(2L, 3L), Seq(7000000L, 1000000L))).toDF("ks", "vs")
    sv.createOrReplaceTempView("ext_sv")
    val sqlBands = spark.sql(
      "SELECT sign_bands(ks, vs, 12, 96) AS b FROM ext_sv")
      .collect().map(_.getSeq[Int](0))
    val colBands = sv.select(graft.expressions.SignBands
        .signBands(col("ks"), col("vs"), 12, 96))
      .collect().map(_.getSeq[Int](0))
    assert(sqlBands.toSeq === colBands.toSeq)
    assert(sqlBands.forall(_.length === 96))
    // constellation_of at two anchor points
    val pts = Seq((37.95, 89.26), (186.65, -63.10)).toDF("ra", "dec")
    pts.createOrReplaceTempView("ext_pts")
    val sqlCon = spark.sql(
      "SELECT constellation_of(ra, dec) AS c FROM ext_pts")
      .collect().map(_.getString(0))
    val colCon = pts.select(graft.expressions.ConstellationOf
        .constellationOf(col("ra"), col("dec")))
      .collect().map(_.getString(0))
    assert(sqlCon.toSeq === colCon.toSeq)
    assert(sqlCon.toSeq === Seq("Ursa Minor", "Crux"))
    // rainbow_fit over a tiny synthetic history (parity, not physics —
    // RainbowFitSpec owns the numerics)
    val hist = spark.sql(
      """SELECT array(
        |  named_struct('jd', 1.0d, 'f', 1.0d, 'e', 0.1d, 'fid', 1, 'ok', true),
        |  named_struct('jd', 2.0d, 'f', 2.0d, 'e', 0.1d, 'fid', 2, 'ok', true),
        |  named_struct('jd', 3.0d, 'f', 3.0d, 'e', 0.1d, 'fid', 1, 'ok', true),
        |  named_struct('jd', 4.0d, 'f', 3.5d, 'e', 0.1d, 'fid', 2, 'ok', true),
        |  named_struct('jd', 5.0d, 'f', 3.8d, 'e', 0.1d, 'fid', 1, 'ok', true)
        |) AS pts, 5.0d AS jd_max""".stripMargin)
    hist.createOrReplaceTempView("ext_hist")
    val sqlFit = spark.sql(
      "SELECT rainbow_fit(pts, jd_max) AS r FROM ext_hist")
      .select("r.*").collect()(0)
    val colFit = hist.select(graft.expressions.RainbowFit
        .rainbowFit(col("pts"), col("jd_max")).as("r"))
      .select("r.*").collect()(0)
    assert(sqlFit === colFit)
  }

  test("intersect_count rejects non-bigint arrays at analysis time") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT intersect_count(array(1, 2), array(2, 3)) FROM ext_docs")
        .collect()
    }
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }

  test("non-literal size argument fails loudly") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, length(text)) FROM ext_docs")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("the extensions class applies cleanly to a fresh injection point") {
    new GraftExtensions()(new SparkSessionExtensions)
  }

  test("angular_separation kernel: SQL == Column == composed formula") {
    import spark.implicits._
    val pts = Seq((0.0, 0.0, 0.0, 1.0), (10.0, -30.0, 11.0, -30.5),
      (359.9, 10.0, 0.1, 10.0), (192.85948, 27.12825, 266.405, -28.936),
      (123.456, 45.678, 123.456, 45.678))
      .toDF("ra1", "dec1", "ra2", "dec2")
    // the pre-round-4 composed-Column tree, re-built inline: the kernel
    // must reproduce it BIT-exactly (oracle + golden-count contract)
    val d2r = math.Pi / 180.0
    val dra = (col("ra2") - col("ra1")) * d2r / 2.0
    val ddec = (col("dec2") - col("dec1")) * d2r / 2.0
    val composed = asin(sqrt(pow(sin(ddec), 2) +
      cos(col("dec1") * d2r) * cos(col("dec2") * d2r) * pow(sin(dra), 2)
    )) * 2.0 / d2r
    val cmp = pts
      .withColumn("k", graft.astro.Astro.angSepDeg(
        col("ra1"), col("dec1"), col("ra2"), col("dec2")))
      .withColumn("c", composed)
      .selectExpr("angular_separation(ra1, dec1, ra2, dec2) AS s", "k", "c")
      .collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }
    // 1 degree along a meridian is exactly 1 degree of separation
    assert(math.abs(cmp(0).getDouble(0) - 1.0) < 1e-12)
  }

  test("ZonePruneRule injects |Δdec| bound into a naive xmatch join") {
    import spark.implicits._
    val ev = (0L until 200L).map(i =>
      (i, (i * 7919 % 3600) / 10.0, (i * 104729 % 1200) / 10.0 - 60.0))
      .toDF("id", "ra", "dec")
    val cat = Seq((1L, 10.0, 5.0), (2L, 200.0, -40.0), (3L, 355.0, 55.0))
      .toDF("cat_id", "cra", "cdec")
    // NAIVE user formulation: separation bound only, no hand prune
    val sep = graft.astro.Astro.angSepDeg(
      col("ra"), col("dec"), col("cra"), col("cdec"))
    val joined = ev.join(broadcast(cat), sep < 15.0)
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs("), s"zone prune missing:\n$optimized")
    assert(optimized.contains("15.001"), s"margin missing:\n$optimized")
    // idempotent: the rule runs every optimizer round — exactly one
    // zone conjunct per bound, not one per round
    val nAbs = "abs\\(".r.findAllMatchIn(optimized).length
    assert(nAbs === 1, s"expected 1 zone conjunct, got $nAbs:\n$optimized")
    // semantics preserved: same pairs as the un-pruned cross product
    val naive = ev.crossJoin(broadcast(cat))
      .filter(graft.astro.Astro.angSepDeg(
        col("ra"), col("dec"), col("cra"), col("cdec")) < 15.0)
    assert(joined.count() === naive.count())
    assert(joined.count() > 0)
  }

  test("ZonePruneRule skips nondeterministic inputs and hand-pruned joins") {
    import spark.implicits._
    val pts = Seq((0.0, 0.0)).toDF("ra", "dec")
    // nondeterministic dec argument: re-evaluating it in an injected
    // conjunct would draw a different value and could drop rows — the
    // rule must leave the predicate alone
    val jittered = pts.filter(graft.astro.Astro.angSepDeg(
      col("ra"), col("dec") + (rand() - 0.5) * 0.01,
      lit(0.0), lit(1.0)) < 5.0)
    assert(!jittered.queryExecution.optimizedPlan.toString.contains("abs("))
    // hand-pruned (q11 style, strict < with baked-in margin): already
    // zone-bounded — the rule must not stack a second abs conjunct
    val cat = Seq((1L, 0.5, 0.5)).toDF("cat_id", "cra", "cdec")
    val hand = pts.join(broadcast(cat),
      abs(col("dec") - col("cdec")) < 5.001 &&
        graft.astro.Astro.angSepDeg(
          col("ra"), col("dec"), col("cra"), col("cdec")) < 5.0)
    val nAbs = "abs\\(".r
      .findAllMatchIn(hand.queryExecution.optimizedPlan.toString).length
    assert(nAbs === 1, s"rule stacked a duplicate zone bound ($nAbs)")
    assert(hand.count() === 1)
    // a LOOSE pre-existing bound must NOT suppress the tight prune:
    // abs < 60 prunes almost nothing at r = 5 — the rule still injects
    val loose = pts.join(broadcast(cat),
      abs(col("dec") - col("cdec")) < 60.0 &&
        graft.astro.Astro.angSepDeg(
          col("ra"), col("dec"), col("cra"), col("cdec")) < 5.0)
    val nAbsLoose = "abs\\(".r
      .findAllMatchIn(loose.queryExecution.optimizedPlan.toString).length
    assert(nAbsLoose === 2, s"tight prune missing under loose bound ($nAbsLoose)")
    assert(loose.count() === 1)
  }

  test("BoundedEditDistanceRule: every comparison shape rewrites and preserves semantics") {
    // parquet-backed source: a LocalRelation would be constant-folded
    // wholesale before the rewrite is observable in the plan
    val df = docs.select(substring(col("text"), 1, 5).as("s"),
      substring(col("text"), 7, 5).as("t"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val shapes: Seq[(String, Int => Boolean)] = Seq(
      ("levenshtein(s, t) <= 2", _ <= 2),
      ("levenshtein(s, t) < 2", _ < 2),
      ("2 >= levenshtein(s, t)", _ <= 2),
      ("levenshtein(s, t) > 1", _ > 1),
      ("1 < levenshtein(s, t)", _ > 1),
      ("levenshtein(s, t) >= 2", _ >= 2),
      ("levenshtein(s, t) = 1", _ == 1),
      ("1 = levenshtein(s, t)", _ == 1))
    shapes.foreach { case (cond, pred) =>
      val q = df.filter(expr(cond))
      val opt = q.queryExecution.optimizedPlan.toString
      // the rewritten plan carries a THREE-argument levenshtein
      // (the threshold prints as Some(k) in the logical plan)
      assert("levenshtein\\(.*Some\\(\\d+\\)\\)".r
        .findFirstIn(opt).isDefined, s"no threshold rewrite for '$cond':\n$opt")
      assert(q.count() === rows.count { case (a, b) => pred(lev(a, b)) },
        s"semantics changed for '$cond'")
    }
  }

  test("BoundedEditDistanceRule: non-literal and negative bounds are untouched") {
    val df = docs.select(substring(col("text"), 1, 4).as("s"),
      substring(col("text"), 6, 4).as("t"),
      (col("doc_id") % 3).cast("int").as("klim"))
    val colBound = df.filter(expr("levenshtein(s, t) <= klim"))
    val opt = colBound.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein("), opt)
    assert(!opt.contains("Some("), s"column bound must not rewrite:\n$opt")
    // negative literal: left for constant folding, not a threshold
    val neg = df.filter(expr("levenshtein(s, t) <= -1"))
    assert(neg.count() === 0)
  }

  test("ZonePruneRule leaves non-spatial predicates untouched") {
    import spark.implicits._
    val a = Seq((1L, 2.0)).toDF("k", "x")
    val b = Seq((1L, 3.0)).toDF("k2", "y")
    val j = a.join(b, col("x") < col("y") && col("k") === col("k2"))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(!opt.contains("abs("), opt)
    assert(j.count() === 1)
  }
}
