package graft.enrich

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EnrichmentSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = SparkSpec.ztfRegular

  test("SdssStarVeto drops exactly the alerts matching a star") {
    val target = df.select(col("candid"),
      col("candidate.ra"), col("candidate.dec")).head()
    val stars = Seq(("star1", target.getDouble(1), target.getDouble(2), 5.0))
      .toDF("name", "ra", "dec", "radius_arcsec")
    val out = new Enrichment.SdssStarVeto(stars)(df)
    assert(out.count() === df.count() - 1)
    assert(out.filter(col("candid") === target.getLong(0)).count() === 0)
    assert(Enrichment.Passthrough(df).count() === df.count())
  }

  test("TnsResolver left-joins names, null when unresolved") {
    val oid = df.select("objectId").head().getString(0)
    val lookup = Seq((oid, "SN 2021abc")).toDF("objectId", "tns_name")
    val out = new Enrichment.TnsResolver(lookup)(df)
    assert(out.count() === df.count())
    assert(out.filter(col("objectId") === oid)
      .select("tns_name").head().getString(0) === "SN 2021abc")
    assert(out.filter(col("objectId") =!= oid)
      .filter(col("tns_name").isNotNull).count() === 0)
  }
}
