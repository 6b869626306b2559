package graft.filters

import graft.SparkSpec
import graft.filters.ztf.{ZtfHostlessFilters => H}

/** Golden counts for the hostless family building blocks on the
  * 133-alert fixture, derived by pandas replication (the doctest numbers
  * in the reference refer to an older, larger fixture): uncataloged=12,
  * intra-night cadence=54, inter-night cadence=10; cheap cuts compose to
  * 2/0/0 (the `*_fast` registered siblings), and the REGISTERED trio —
  * real KS image stage ON, the reference's registered behavior — keeps
  * 1/0/0 (one of the two new-hostless cheap survivors has a science
  * stamp whose centre-vs-background KS exceeds the 0.5 bound).
  */
class HostlessSpec extends SparkSpec {

  private lazy val df = SparkSpec.ztfRegular

  test("isUncataloged == 12") {
    assert(df.filter(H.isUncataloged).count() === 12L)
  }
  test("intra-night cadence == 54, inter-night cadence == 10") {
    assert(df.filter(H.intraNightCadence()).count() === 54L)
    assert(df.filter(H.interNightCadence()).count() === 10L)
  }
  test("FITS decode + KS statistic work on real stamps") {
    import org.apache.spark.sql.functions._
    val rows = df.select(col("cutoutScience.stampData").as("sci"),
      col("cutoutTemplate.stampData").as("tpl")).limit(5).collect()
    rows.foreach { r =>
      val (w, h, px) = graft.multimodal.FitsOps
        .decodeFloatImage(r.getAs[Array[Byte]](0))
      assert(w === 63 && h === 63 && px.length === 63 * 63)
      val ks = graft.multimodal.FitsOps.hostlessKs(r.getAs[Array[Byte]](0))
      assert(ks >= 0.0 && ks <= 1.0, ks)
    }
  }

  test("new_hostless with the real KS image stage is deterministic") {
    val f = graft.filters.ztf.ZtfHostlessFilters
      .newHostless(new graft.filters.ztf.ZtfHostlessFilters.FitsKsScorer())
    val n1 = f(df).count()
    val n2 = f(df).count()
    assert(n1 === n2)
    assert(n1 <= 2) // bounded by the 2 uncataloged-and-new candidates
  }

  test("registered hostless trio (real KS image stage ON) keeps 1/0/0") {
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.new_hostless").count() === 1L)
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.intra_night_hostless").count() === 0L)
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.inter_night_hostless").count() === 0L)
  }

  test("registered *_fast siblings (cheap cuts only) keep 2/0/0") {
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.new_hostless_fast").count() === 2L)
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.intra_night_hostless_fast").count() === 0L)
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.inter_night_hostless_fast").count() === 0L)
    val desc = FilterRegistry.get("ztf.livestream.new_hostless_fast")
      .description
    assert(desc.contains("SKIPPED"), desc)
  }
}
