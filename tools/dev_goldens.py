#!/usr/bin/env python3
"""DEV-ONLY golden-count generator (not part of the shipped library).

The reference doctests quote golden counts for a ~330-alert fixture, but the
checkout at /root/reference/datatest/regular holds 133 alerts, so the doctest
numbers do not apply. This script re-derives the expected count for each
filter by replicating the reference's pandas predicate logic
(fink_filters/ztf/**/filter.py) on the actual fixture. The resulting numbers
are pinned in the ScalaTest suites.

Run: python3 tools/dev_goldens.py
"""
import json
import pandas as pd
import numpy as np

PDF = pd.read_parquet("/root/reference/datatest/regular")
C = PDF["candidate"]


def f(name):
    return C.apply(lambda x: x[name])


# fink_utils.xmatch.simbad.return_list_of_eg_host (public fink-utils repo)
EG_HOSTS = ["Unknown", "Candidate_SN*", "SN", "SN candidate"] + [
    "galaxy", "Galaxy", "EmG", "Seyfert", "Seyfert_1", "Seyfert_2",
    "BlueCompG", "StarburstG", "LSB_G", "HII_G", "High_z_G", "GinPair",
    "GinGroup", "BClG", "GinCl", "PartofG",
]

goldens = {}

# quality_cuts: filter_quality_cuts/filter.py:48-50
goldens["ztf_quality_cuts"] = int(((f("rb") >= 0.55) & (f("nbad") == 0)).sum())

# sn_candidates: livestream/filter_sn_candidates/filter.py:86-104
f_sn = (
    ((PDF["snn_snia_vs_nonia"].astype(float) > 0.5)
     | (PDF["snn_sn_vs_all"].astype(float) > 0.5))
    & PDF["cdsxmatch"].isin(EG_HOSTS)
    & (f("jd") - f("jdstarthist") <= 90)
    & (f("drb") > 0.5)
    & (f("classtar") > 0.4)
    & (f("ndethist") > 1)
    & (PDF["roid"] != 3)
)
goldens["sn_candidates"] = int(f_sn.sum())

# early_sn_candidates: livestream/filter_early_sn_candidates/filter.py:78-90
f_sn_base = (
    ((PDF["snn_snia_vs_nonia"].astype(float) > 0.5)
     | (PDF["snn_sn_vs_all"].astype(float) > 0.5))
    & PDF["cdsxmatch"].isin(EG_HOSTS)
    & (f("drb") > 0.5)
    & (f("classtar") > 0.4)
)
goldens["early_sn_candidates"] = int(
    (f_sn_base & (f("ndethist") <= 20)
     & (PDF["rf_snia_vs_nonia"].astype(float) > 0.5)).sum())

# kn_candidates (core mask): livestream/filter_kn_candidates/filter.py:87-99
f_kn = (
    (PDF["rf_kn_vs_nonkn"].astype(float) > 0.5)
    & (f("drb") > 0.5) & (f("classtar") > 0.4)
    & (f("jd") - f("jdstarthist") < 5)
    & (PDF["roid"] != 3)
    & (f("ndethist") < 20)
    & PDF["cdsxmatch"].isin(EG_HOSTS)
)
goldens["kn_candidates"] = int(f_kn.sum())

# sso_ztf roid==3 / sso_fink roid==2 / microlensing mulens>0
goldens["sso_ztf_candidates"] = int((PDF["roid"] == 3).sum())
goldens["sso_fink_candidates"] = int((PDF["roid"] == 2).sum())
goldens["microlensing_candidates"] = int((PDF["mulens"] > 0.0).sum())

# blazar: isin 4 classes
goldens["blazar"] = int(PDF["cdsxmatch"].isin(
    ["Blazar", "Blazar_Candidate", "BLLac", "BLLac_Candidate"]).sum())

# simbad_grav: 9 classes
goldens["simbad_grav_candidates"] = int(PDF["cdsxmatch"].isin([
    "Gravitation", "LensingEv", "GravLensSystem", "GravLens", "LensedImage",
    "LensedG", "LensedQ", "BlackHole", "GravWaveEvent"]).sum())

# tns_match: tns != "" and jd-jdstarthist<=30
goldens["tns_match"] = int(
    ((PDF["tns"] != "") & (f("jd") - f("jdstarthist") <= 30)).sum())

# vra: livestream/filter_vra/filter.py:59-62
goldens["vra"] = int(((PDF["cdsxmatch"] == "Unknown") & (PDF["roid"] != 3)
                      & (f("magpsf") > 19.5) & (f("drb") > 0.5)).sum())

# yso: 4 classes
goldens["yso_candidates"] = int(PDF["cdsxmatch"].isin(
    ["Candidate_YSO", "Candidate_TTau*", "YSO_Candidate",
     "TTau*_Candidate"]).sum())

# rrlyr
goldens["rrlyr"] = int(PDF["cdsxmatch"].isin(["RRLyr", "RRLyrae"]).sum())

# simbad_candidates: not in bad set, not startswith Fail/Galaxy
cds = PDF["cdsxmatch"]
f_simbad = (~cds.isin(["Unknown", "Transient", "Fail", "Fail 504"])
            & ~cds.str.startswith("Fail") & ~cds.str.startswith("Galaxy"))
goldens["simbad_candidates"] = int(f_simbad.sum())

# gaia: DR3Name != "nan" (string nan quirk)
goldens["gaia_dr3_candidates"] = int((PDF["DR3Name"] != "nan").sum())

# tracklet: startswith TRCK_
goldens["tracklet_candidates"] = int(
    PDF["tracklet"].apply(lambda x: str(x).startswith("TRCK_")).sum())

# snlike: rfscore>0 & cdsxmatch==Unknown & neargaia>5 & distpsnr1>5
goldens["snlike"] = int(((PDF["rf_snia_vs_nonia"] > 0.0)
                         & (cds == "Unknown")
                         & (f("neargaia") > 5.0)
                         & (f("distpsnr1") > 5.0)).sum())

# example_filter: simbad minus Galaxy, magpsf>20.5
ex = (~cds.isin(["Unknown", "Transient"])
      & ~cds.str.startswith("Fail") & ~cds.str.startswith("Galaxy")
      & (f("magpsf") > 20.5))
goldens["example_filter"] = int(ex.sum())

# vast_supernovae: mangrove lum_dist<200, dec<-10, tns not in {"",Unknown}
def tofloat(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return np.nan

lum = PDF["mangrove"].apply(
    lambda m: tofloat(dict(m).get("lum_dist")) if m is not None else np.nan)
goldens["vast_supernovae"] = int(((lum < 200) & (f("dec") < -10)
                                  & ~PDF["tns"].isin(["", "Unknown"])).sum())
goldens["vast_supernovae_candidates"] = int(
    ((lum < 200) & (f("dec") < -10)
     & (PDF["snn_sn_vs_all"] > 0.5)).sum())

# blazar high/low state from blazar_stats map
bs = PDF["blazar_stats"]
def bsget(key):
    return bs.apply(lambda m: float(dict(m).get(key, "nan"))
                    if m is not None else np.nan)
ih, rh = bsget("instantness_high"), bsget("robustness_high")
il, rl = bsget("instantness_low"), bsget("robustness_low")
goldens["blazar_high_state"] = int(((ih > 1) & (rh > 1)).sum())
goldens["blazar_low_state"] = int(
    ((il < 1) & (il >= 0) & (rl < 1) & (rl >= 0)).sum())

print(json.dumps(goldens, indent=2))
