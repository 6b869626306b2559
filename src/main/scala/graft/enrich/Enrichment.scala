package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.xmatch.CrossMatch

/** External-service enrichments (O26) as injectable lookup DataFrames.
  *
  * The reference calls SDSS / TNS / Fink-API / SNAD over HTTP per
  * candidate (`filter_early_kn_candidates/filter.py:139-164`,
  * `filter_rate_based_kn_candidates/filter.py:169-197`,
  * `lcs.py:53-216`). A zero-egress engine models each service as a
  * DataFrame with a declared contract, joined distributively —
  * deployments back them with snapshots or a foreachBatch-side client;
  * tests back them with fixtures. No HTTP in the engine core, no
  * per-candidate driver loops.
  */
object Enrichment {

  /** A composable enrichment stage. */
  trait Stage extends Serializable {
    def apply(df: DataFrame): DataFrame
  }

  /** Identity — the explicit "service unavailable / skip" stub. */
  object Passthrough extends Stage {
    def apply(df: DataFrame): DataFrame = df
  }

  /** SDSS star veto (the final cut of both KN filters): drop alerts
    * whose position mutual-nearest-matches a cataloged star within
    * `radius_arcsec`. Catalog contract: (name, ra, dec, radius_arcsec).
    */
  class SdssStarVeto(starCatalog: DataFrame) extends Stage {
    def apply(df: DataFrame): DataFrame =
      CrossMatch.mutualNearestLabel(df, "candid",
        col("candidate.ra"), col("candidate.dec"), starCatalog, "__sdss")
        .filter(col("__sdss") === "Unknown")
        .drop("__sdss")
  }

  /** TNS resolver (the reference keeps a global name cache,
    * `lcs.py:53-99`): left join on objectId adding `tns_name` (null when
    * unresolved). Lookup contract: (objectId, tns_name).
    */
  class TnsResolver(lookup: DataFrame) extends Stage {
    def apply(df: DataFrame): DataFrame =
      df.join(broadcast(lookup.select(col("objectId").as("__oid"),
        col("tns_name"))), df("objectId") === col("__oid"), "left")
        .drop("__oid")
  }
}
