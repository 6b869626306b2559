package graft.streaming

import graft.SparkSpec
import graft.colops.ColOps

/** Message formatting + the concat_col rename-parity helper. */
class NotificationsSpec extends SparkSpec {

  test("formatRaDec renders hours/degrees with sign") {
    val s = Notifications.formatRaDec(15.0, -1.5)
    assert(s.startsWith("1 h 0 m 0.00 s -1° 30′"), s)
  }

  test("alertMessage carries link, band, cadence and position") {
    val m = Notifications.alertMessage("ZTF21acoshvy", "SN candidate",
      2, 19.25, 0.12, 2459500.75, 2459498.25, 150.0, 20.0)
    assert(m.contains("ztf.fink-portal.org/ZTF21acoshvy"))
    assert(m.contains("band r"))
    assert(m.contains("19.25 ± 0.12"))
    assert(m.contains("60.0 hours"))
  }

  test("fromAlertRow formats a real fixture alert") {
    val row = SparkSpec.ztfRegular
      .select("objectId", "candidate").head()
    val m = Notifications.fromAlertRow(row, "Unknown")
    assert(m.contains(row.getString(0)))
    assert(m.contains("*RA/Dec:*"))
  }

  test("concatColsRenamed produces the reference's c<name>c columns") {
    val out = ColOps.concatColsRenamed(
      SparkSpec.ztfRegular, Seq("jd", "magpsf"))
    assert(out.columns.contains("cjdc") && out.columns.contains("cmagpsfc"))
    val r = out.selectExpr("size(cjdc)", "candidate.jd",
      "element_at(cjdc, -1)").head()
    assert(r.getInt(0) >= 1)
    assert(r.getDouble(1) === r.getDouble(2))
  }
}
