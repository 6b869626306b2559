package graft.classify

import graft.SparkSpec
import graft.filters.FilterRegistry

/** Golden histogram for the classification cascade on the 133-alert ZTF
  * fixture. Expected counts derived by replicating the reference's
  * pandas mask cascade (`classification.py:139-210`) — see the histogram
  * derivation noted in tools/dev_goldens.py.
  */
class ClassifySpec extends SparkSpec {

  private lazy val df = SparkSpec.ztfRegular

  private val expected = Map(
    "LongPeriodV*" -> 6L, "Unknown" -> 6L, "CataclyV*_Candidate" -> 4L,
    "RRLyrae" -> 4L, "EclBin" -> 4L, "AGB*_Candidate" -> 3L,
    "PlanetaryNeb" -> 3L, "SN candidate" -> 3L, "Seyfert2" -> 3L,
    "Ae*" -> 3L, "blue" -> 3L, "delSctV*" -> 3L, "Supernova" -> 3L,
    "YSO_Candidate" -> 3L, "WhiteDwarf" -> 2L, "Mira" -> 2L,
    "RedSG_Candidate" -> 2L, "AGN_Candidate" -> 2L, "bCepV*" -> 2L,
    "AGN" -> 2L, "BlueSG" -> 2L, "QSO_Candidate" -> 2L,
    "Early SN Ia candidate" -> 2L, "NearIR" -> 2L, "**" -> 2L,
    "WhiteDwarf_Candidate" -> 2L, "HighMassXBin" -> 2L, "OH/IR*" -> 2L,
    "Inexistent" -> 2L, "HorBranch*_Candidate" -> 2L, "RSCVnV*" -> 2L,
    "YellowSG" -> 2L, "Solar System candidate" -> 2L,
    "Kilonova candidate" -> 2L, "Type2Cep" -> 2L, "CataclyV*" -> 2L,
    "QSO" -> 2L, "WolfRayet*" -> 1L, "Be*" -> 1L, "BLLac" -> 1L,
    "Eruptive*" -> 1L, "LensedImage" -> 1L, "RedSG" -> 1L, "Blazar" -> 1L,
    "Symbiotic*" -> 1L, "IrregularV*" -> 1L, "C*" -> 1L, "Seyfert1" -> 1L,
    "post-AGB*" -> 1L, "TTauri*_Candidate" -> 1L,
    "Supernova_Candidate" -> 1L, "SB*" -> 1L, "Low-Mass*" -> 1L,
    "Variable*_Candidate" -> 1L, "Cluster*" -> 1L, "HorBranch*" -> 1L,
    "S*" -> 1L, "HotSubdwarf_Candidate" -> 1L, "gammaDorV*" -> 1L,
    "PlanetaryNeb_Candidate" -> 1L, "BYDraV*" -> 1L, "AGB*" -> 1L,
    "EmObj" -> 1L, "TTauri*" -> 1L, "GinPair" -> 1L, "OrionV*" -> 1L,
    "Solar System MPC" -> 1L, "BlueSG_Candidate" -> 1L,
    "Planet_Candidate" -> 1L, "LINER" -> 1L, "HighPM*" -> 1L,
    "XrayBin" -> 1L, "Cepheid" -> 1L)

  test("full classification histogram matches the pandas-replicated goldens") {
    val got = Classify.classHistogram(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.values.sum === 133L)
  }

  test("unknowns livestream filter keeps 6 alerts") {
    assert(FilterRegistry.applyFilter(df, "ztf.livestream.unknowns")
      .count() === 6L)
  }
}
