package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions._

/** SQL surface for the native kernels plus the engine's optimizer
  * rule: registers the kernels as functions so `spark.sql("SELECT
  * word_shingles(text), simhash64(toks) ...")` works, and injects
  * [[graft.plans.ZonePruneRule]] so naive spatial cross-match
  * predicates gain the |Δdec| zone prune automatically — the
  * idiomatic `SparkSessionExtensions` route (SURVEY §7.3: custom
  * Catalyst `Expression`s, option (b), plus one `Rule[LogicalPlan]`,
  * option (c); no custom plans/STRATEGIES are needed anywhere in this
  * engine, the DataFrame algebra covers every whole-operator
  * semantic).
  *
  * Two entry points:
  *  - session builder: `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.GraftExtensions`;
  *  - existing session: `GraftExtensions.register(spark)` (same
  *    builders via the session's function registry, the rule via
  *    `experimental.extraOptimizations`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.ZonePruneRule)
    ext.injectOptimizerRule(_ => graft.plans.BoundedEditDistanceRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  /** (name, info, builder) for every native kernel. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("word_shingles",
      info("word_shingles", "word_shingles(text[, n]) - lowercased " +
        "whitespace-normalized word n-shingles (default n=3; n=1 tokenizes)"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => WordShingles(t, 3)
        case Seq(t, n) => WordShingles(t, intLit(n, "shingle size"))
        case _ => throw new IllegalArgumentException(
          "word_shingles(text[, n])")
      }),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(shingles[, k]) - " +
        "k-permutation md5 MinHash signature (default k=16)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => MinHashSignature(s, 16)
        case Seq(s, k) => MinHashSignature(s, intLit(k, "signature width"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(shingles[, k])")
      }),
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit md5 SimHash fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHash64(t)
        case _ => throw new IllegalArgumentException("simhash64(tokens)")
      }),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - Σ aᵢ·bᵢ over equal-length " +
        "numeric arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("dot_product(a, b)")
      }),
    ("intersect_count",
      info("intersect_count", "intersect_count(a, b) - |A ∩ B| over two " +
        "element-distinct long arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => IntersectCount(a, b)
        case _ => throw new IllegalArgumentException("intersect_count(a, b)")
      }),
    ("mode_count",
      info("mode_count", "mode_count(arr) - struct(n_items, top_count): " +
        "total and most-frequent-element occurrence counts"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => ModeCount(a)
        case _ => throw new IllegalArgumentException("mode_count(arr)")
      }),
    ("winnow_fingerprints",
      info("winnow_fingerprints", "winnow_fingerprints(shingles[, w]) - " +
        "distinct MOSS winnowing fingerprints over window w (default 4)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => WinnowFingerprints(s, 4)
        case Seq(s, w) => WinnowFingerprints(s, intLit(w, "window"))
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints(shingles[, w])")
      }),
    ("element_counts",
      info("element_counts", "element_counts(arr) - map<element, count> " +
        "of a string array's element frequencies (first-appearance order)"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => ElementCounts(a)
        case _ => throw new IllegalArgumentException("element_counts(arr)")
      }),
    ("sparse_dot_micros",
      info("sparse_dot_micros", "sparse_dot_micros(ak, av, bk, bv) - " +
        "sorted-sparse-vector dot over (key, value-micros) long arrays; " +
        "returns the exact DECIMAL(38,12)->double value"),
      (args: Seq[Expression]) => args match {
        case Seq(ak, av, bk, bv) => SparseDotMicros(ak, av, bk, bv)
        case _ => throw new IllegalArgumentException(
          "sparse_dot_micros(aKeys, aVals, bKeys, bVals)")
      }),
    ("angular_separation",
      info("angular_separation", "angular_separation(ra1, dec1, ra2, " +
        "dec2) - haversine great-circle separation in degrees"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b, c, d) => AngularSeparation(a, b, c, d)
        case _ => throw new IllegalArgumentException(
          "angular_separation(ra1, dec1, ra2, dec2)")
      }),
    ("sign_bands",
      info("sign_bands", "sign_bands(keys, vals, nBits, nTables) - " +
        "per-table sign-LSH band keys of a sorted sparse vector"),
      (args: Seq[Expression]) => args match {
        case Seq(ks, vs, b, t) =>
          SignBands(ks, vs, intLit(b, "nBits"), intLit(t, "nTables"))
        case _ => throw new IllegalArgumentException(
          "sign_bands(keys, vals, nBits, nTables)")
      }),
    ("constellation_of",
      info("constellation_of", "constellation_of(ra, dec) - IAU " +
        "constellation name at J2000 (ra, dec) degrees"),
      (args: Seq[Expression]) => args match {
        case Seq(ra, dec) => ConstellationOf(ra, dec)
        case _ => throw new IllegalArgumentException(
          "constellation_of(ra, dec)")
      }),
    ("image_dhash",
      info("image_dhash", "image_dhash(pixels, w, h) - 64-bit " +
        "perceptual difference hash of a row-major w x h grayscale " +
        "raster (9x8 area-average grid, horizontal gradient signs)"),
      (args: Seq[Expression]) => args match {
        case Seq(p, w, h) => ImageDHash(p, w, h)
        case _ => throw new IllegalArgumentException(
          "image_dhash(pixels, w, h)")
      }),
    ("rainbow_fit",
      info("rainbow_fit", "rainbow_fit(pts, jd_max) - Levenberg-" +
        "Marquardt Rainbow light-curve fit (sigmoid rise x blackbody) " +
        "over an array<struct{jd,f,e,fid,ok}> flux history"),
      (args: Seq[Expression]) => args match {
        case Seq(p, j) => RainbowFit(p, j)
        case _ => throw new IllegalArgumentException(
          "rainbow_fit(pts, jd_max)")
      }))

  /** Register on an ALREADY-RUNNING session (extensions only apply at
    * session construction).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    Seq(graft.plans.ZonePruneRule, graft.plans.BoundedEditDistanceRule)
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule)) {
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
        }
      }
  }
}
