package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.{DotProduct, MinHashSignature, SimHash64, WinnowFingerprints, WordShingles}

/** Algebraic invariants of the native kernels over a seeded random
  * grid (SURVEY §5) — exact properties, no tolerance:
  *
  *  - SimHash64 is a multiset statistic: invariant under token
  *    permutation, and under doubling the multiset (2·cnt > 2·n is the
  *    same sign as cnt > n... precisely: 2(2c) > 2n ⟺ 2c > n);
  *  - MinHash signatures: order-invariant, and the signature of a
  *    union is the elementwise min of the signatures;
  *  - DotProduct equals the driver-side double fold in the same order,
  *    and is symmetric;
  *  - winnowing fingerprints are a subset of the window count bound.
  */
class KernelPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val words =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private def randTokens(n: Int): Seq[String] =
    Seq.fill(n)(words(rnd.nextInt(words.size)))

  test("SimHash64: permutation- and doubling-invariant") {
    val rows = (1 to 40).map { i =>
      val t = randTokens(3 + rnd.nextInt(60))
      (t, rnd.shuffle(t), t ++ t)
    }
    val r = rows.toDF("t", "perm", "doubled").select(
      SimHash64.simhash(col("t")).as("a"),
      SimHash64.simhash(col("perm")).as("b"),
      SimHash64.simhash(col("doubled")).as("c")).collect()
    r.foreach { row =>
      assert(row.getLong(0) === row.getLong(1))
      assert(row.getLong(0) === row.getLong(2))
    }
  }

  test("MinHash: order-invariant; union signature == elementwise min") {
    val rows = (1 to 30).map { _ =>
      val a = randTokens(2 + rnd.nextInt(20)).map(t => s"sh:$t")
      val b = randTokens(2 + rnd.nextInt(20)).map(t => s"sh:$t")
      (a, rnd.shuffle(a), b, a ++ b)
    }
    val r = rows.toDF("a", "aPerm", "b", "ab").select(
      MinHashSignature.signature(col("a"), 8).as("sa"),
      MinHashSignature.signature(col("aPerm"), 8).as("saPerm"),
      MinHashSignature.signature(col("b"), 8).as("sb"),
      MinHashSignature.signature(col("ab"), 8).as("sab")).collect()
    r.foreach { row =>
      val (sa, sap, sb, sab) = (row.getSeq[String](0), row.getSeq[String](1),
        row.getSeq[String](2), row.getSeq[String](3))
      assert(sa === sap)
      // numeric min: signature entries are variable-width decimal strings
      assert(sab.map(_.toLong) ===
        sa.zip(sb).map { case (x, y) => math.min(x.toLong, y.toLong) })
    }
  }

  test("DotProduct: equals driver fold in identical order; symmetric") {
    val rows = (1 to 40).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val got = rows.toDF("a", "b").select(
      DotProduct.dot(col("a"), col("b")).as("ab"),
      DotProduct.dot(col("b"), col("a")).as("ba")).collect()
    rows.zip(got).foreach { case ((a, b), row) =>
      var s = 0.0
      var i = 0
      while (i < 64) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      assert(row.getDouble(0) === s) // bit-exact, same fold order
      assert(row.getDouble(0) === row.getDouble(1))
    }
  }

  test("WordShingles: count = max(1, tokens−n+1); n−1 separators per " +
    "shingle; shingles are substrings of the normalized text") {
    val rows = (1 to 60).map { _ =>
      val toks = randTokens(1 + rnd.nextInt(30))
      // random messy whitespace between tokens
      val seps = Seq(" ", "  ", "\t", " \n ", "\r\n")
      Tuple1(toks.map(t => if (rnd.nextBoolean()) t.toUpperCase else t)
        .mkString(seps(rnd.nextInt(seps.size))))
    }
    val r = rows.toDF("text").select(col("text"),
      WordShingles.shingles(col("text")).as("s3"),
      WordShingles.shingles(col("text"), 1).as("s1")).collect()
    r.foreach { row =>
      val norm = row.getString(0).toLowerCase.replaceAll("\\s+", " ")
      val nTok = norm.split(" ", -1).length
      val s3 = row.getSeq[String](1)
      val s1 = row.getSeq[String](2)
      assert(s1.size === nTok)
      assert(s3.size === math.max(1, nTok - 2))
      if (nTok >= 3) s3.foreach { sh =>
        assert(sh.count(_ == ' ') === 2)
        assert(norm.contains(sh))
      }
      assert(s1.mkString(" ") === norm) // n=1 round-trips the text
    }
  }

  test("IntersectCount: equals driver set intersection incl. sentinels") {
    val cases = (1 to 60).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextLong()).distinct
      val b =
        (Seq.fill(rnd.nextInt(40))(rnd.nextLong()) ++
          rnd.shuffle(a).take(rnd.nextInt(a.size + 1))).distinct
      (a, b)
    } ++ Seq(
      (Seq.empty[Long], Seq(1L, 2L)),                  // empty side
      (Seq(Long.MinValue, 0L), Seq(Long.MinValue)),    // sentinel key
      (Seq(Long.MinValue), Seq(7L)),                   // sentinel miss
      (Seq(1L, 2L, 3L), Seq(4L, 5L))                   // disjoint
    )
    val got = cases.toDF("a", "b").select(
      graft.expressions.IntersectCount.intersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g === a.toSet.intersect(b.toSet).size.toLong, s"a=$a b=$b")
    }
  }

  test("string kernels handle multi-byte text like the reference paths") {
    import spark.implicits._
    val texts = Seq(
      "héllo wörld héllo wörld encore",       // latin diacritics
      "日本語 テキスト の 分割 日本語 処理",     // CJK with spaces
      "mixed ascii και ελληνικά και emoji 🚀 test",
      "né break regular break")           // NBSP is NOT \s-matched ws
    val df = texts.toDF("text")
    // shingles(n=1) must round-trip the normalized text (byte-safe
    // slicing would split codepoints)
    val r = df.select(col("text"),
      graft.expressions.WordShingles.shingles(col("text"), 1).as("t1"))
      .collect()
    r.foreach { row =>
      val norm = row.getString(0).toLowerCase.replaceAll("\\s+", " ")
      assert(row.getSeq[String](1).mkString(" ") === norm, row.getString(0))
    }
    // ElementCounts groups by full-codepoint equality
    val counts = df
      .select(explode(graft.expressions.ElementCounts.elementCounts(
        graft.expressions.WordShingles.shingles(col("text"), 1)))
        .as(Seq("t", "c")))
      .groupBy("t").agg(sum("c").as("c")).collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(counts("héllo") === 2L && counts("日本語") === 2L)
    // fingerprint: equal normalized text -> equal fp; distinct -> distinct
    val fps = Seq("héllo  Wörld", "héllo wörld", "hello world")
      .toDF("text")
      .select(graft.llmops.TextOps.fingerprint(col("text")))
      .collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(1) !== fps(2))
  }

  test("IntersectCount: null slots follow array_intersect set semantics") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = true)),
      StructField("b", ArrayType(LongType, containsNull = true))))
    val cases: Seq[(Seq[Any], Seq[Any])] = Seq(
      (Seq(1L, null, 2L), Seq(null, 2L, 5L)), // null in both -> counts once
      (Seq(1L, null), Seq(1L, 3L)),           // null one side -> no hit
      (Seq(null), Seq(null)),
      (Seq(null, Long.MinValue), Seq(Long.MinValue)) // null + sentinel key
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (a, b) => Row(a, b) }),
      schema)
    df.select(
        graft.expressions.IntersectCount.intersectCount(col("a"), col("b"))
          .as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("ElementCounts: equals the explode/groupBy counts on real docs") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), WordShingles.shingles(col("text"), 2).as("bg"))
    val kernel = d
      .select(col("doc_id"),
        explode(graft.expressions.ElementCounts.elementCounts(col("bg")))
          .as(Seq("e", "c")))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val grouped = d.select(col("doc_id"), explode(col("bg")).as("e"))
      .groupBy("doc_id", "e").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(kernel.nonEmpty)
    assert(kernel === grouped)
    // null slots skipped; empty array -> empty map
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    val edge = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq("a", null, "a", "b")), Row(Seq.empty[String]))),
      StructType(Seq(StructField("arr",
        ArrayType(StringType, containsNull = true)))))
    val got = edge.select(
      graft.expressions.ElementCounts.elementCounts(col("arr")).as("m"))
      .collect().map(_.getMap[String, Long](0))
    assert(got(0) === Map("a" -> 2L, "b" -> 1L))
    assert(got(1).isEmpty)
  }

  test("SparseDotMicros: equals the decimal-sum dot, incl. rounding") {
    import java.math.{BigDecimal => JBD, BigInteger}
    val cases = (1 to 60).map { _ =>
      def vec(n: Int): Seq[(Long, Long)] =
        Seq.fill(n)(rnd.nextLong() -> (rnd.nextInt(300000000).toLong + 1))
          .distinctBy(_._1).sortBy(_._1)
      val a = vec(1 + rnd.nextInt(40))
      // b shares a random subset of a's keys (fresh values)
      val shared = rnd.shuffle(a).take(rnd.nextInt(a.size + 1))
        .map { case (k, _) => k -> (rnd.nextInt(300000000).toLong + 1) }
      val b = (vec(rnd.nextInt(40)) ++ shared).distinctBy(_._1).sortBy(_._1)
      (a, b)
    } ++ Seq((Seq(1L -> 5L), Seq(2L -> 7L))) // disjoint -> 0.0
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.expressions.SparseDotMicros.sparseDotMicros(
        transform(col("a"), _.getField("_1")),
        transform(col("a"), _.getField("_2")),
        transform(col("b"), _.getField("_1")),
        transform(col("b"), _.getField("_2"))))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      val bm = b.toMap
      val sum = a.map { case (k, v) =>
        BigInteger.valueOf(v).multiply(
          BigInteger.valueOf(bm.getOrElse(k, 0L)))
      }.reduce(_ add _)
      // the exact DECIMAL(38,12) -> double conversion
      val want = new JBD(sum, 12).doubleValue()
      assert(g === want, s"a=$a b=$b")
    }
  }

  test("ModeCount: equals grouped counts on real docs and driver folds") {
    // real corpus: kernel == the explode/groupBy formulation it replaces
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), WordShingles.shingles(col("text"), 2).as("bg"))
    val kernel = d.select(col("doc_id"),
        graft.expressions.ModeCount.modeCount(col("bg")).as("mc"))
      .select(col("doc_id"), col("mc.n_items"), col("mc.top_count"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val grouped = d.select(col("doc_id"), explode(col("bg")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), max("c").as("top"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kernel === grouped)
    // random multisets vs a driver-side fold
    val cases = (1 to 30).map(_ => randTokens(1 + rnd.nextInt(50)))
    val got = cases.toDF("arr").select(
      graft.expressions.ModeCount.modeCount(col("arr")).as("mc"))
      .select("mc.n_items", "mc.top_count")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    cases.zip(got).foreach { case (ts, (n, top)) =>
      assert(n === ts.size.toLong)
      assert(top === ts.groupBy(identity).values.map(_.size).max.toLong)
    }
  }

  test("winnowing: count bounded by window positions, never empty") {
    val rows = (1 to 40).map(_ => Tuple1(randTokens(1 + rnd.nextInt(30))
      .map(t => s"g:$t")))
    val r = rows.toDF("sh")
      .select(col("sh"), WinnowFingerprints.winnow(col("sh"), 4).as("fp"))
      .collect()
    r.foreach { row =>
      val n = row.getSeq[String](0).size
      val fp = row.getSeq[String](1)
      assert(fp.nonEmpty)
      assert(fp.size <= math.max(1, n - 3))
      assert(fp.distinct.size === fp.size)
    }
  }
}
