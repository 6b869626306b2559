package graft.filters

import graft.SparkSpec
import graft.filters.ztf.{ZtfHostlessFilters => H}

/** Golden counts for the hostless family building blocks on the
  * 133-alert fixture, derived by pandas replication (the doctest numbers
  * in the reference refer to an older, larger fixture): uncataloged=12,
  * intra-night cadence=54, inter-night cadence=10; composed filters with
  * the stub image stage: 2/0/0.
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
  test("hostless filters (stub image stage) keep 2/0/0") {
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.new_hostless").count() === 2L)
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.intra_night_hostless").count() === 0L)
    assert(FilterRegistry.applyFilter(df,
      "ztf.livestream.inter_night_hostless").count() === 0L)
  }
}
