#!/usr/bin/env python3
"""DEV-ONLY golden derivations (not part of the shipped library) for the
suites added in round 2: classification histogram, unknowns, hostless
blocks/cadence, mm module, yso_spicy, orphan GRB, rate-based KN pre-cuts,
early-TDE prefilter, magnetic CVs. Replicates the reference's pandas
predicates on THIS checkout's fixtures (the reference doctest numbers are
stale for several modules — older, larger fixture).

Run: python3 tools/dev_goldens_extra.py
"""
import json
from math import erf, sqrt

import numpy as np
import pandas as pd

PDF = pd.read_parquet("/root/reference/datatest/regular")
C = PDF["candidate"]
f = lambda n: C.apply(lambda x: x[n])
cds = PDF["cdsxmatch"]
EG = ["Unknown", "Candidate_SN*", "SN", "SN candidate", "galaxy", "Galaxy",
      "EmG", "Seyfert", "Seyfert_1", "Seyfert_2", "BlueCompG", "StarburstG",
      "LSB_G", "HII_G", "High_z_G", "GinPair", "GinGroup", "BClG", "GinCl",
      "PartofG"]

out = {}


def conc(row, name):
    prv = row["prv_candidates"]
    return [p[name] for p in (prv if prv is not None else [])] + \
        [row["candidate"][name]]


# ---- classification cascade (ClassifySpec) ----
snn = (PDF["snn_snia_vs_nonia"].astype(float) > 0.5) | \
      (PDF["snn_sn_vs_all"].astype(float) > 0.5)
f_tracklet = PDF["tracklet"].apply(lambda x: str(x).startswith("TRCK_"))
f_simbad = (~cds.isin(["Unknown", "Transient", "Fail", "Fail 504"])
            & ~cds.str.startswith("Fail") & ~cds.str.startswith("Galaxy"))
f_sn_early = (snn & cds.isin(EG) & (f("drb") > 0.5) & (f("classtar") > 0.4)
              & (f("ndethist") <= 20)
              & (PDF["rf_snia_vs_nonia"].astype(float) > 0.5))
f_sn = (snn & cds.isin(EG) & (f("jd") - f("jdstarthist") <= 90)
        & (f("drb") > 0.5) & (f("classtar") > 0.4) & (f("ndethist") > 1)
        & (PDF["roid"] != 3))
f_mulens = PDF["mulens"] > 0
f_kn = ((PDF["rf_kn_vs_nonkn"].astype(float) > 0.5) & (f("drb") > 0.5)
        & (f("classtar") > 0.4) & (f("jd") - f("jdstarthist") < 5)
        & (PDF["roid"] != 3) & (f("ndethist") < 20) & cds.isin(EG))
f_r3 = PDF["roid"] == 3
f_r2 = PDF["roid"] == 2


def cascade(with_tracklet=True):
    cls = pd.Series(["Unknown"] * len(cds))
    amb = pd.Series([0] * len(cds))
    cls = cls.mask(f_mulens.to_numpy(), "Microlensing candidate")
    cls = cls.mask(f_sn.to_numpy(), "SN candidate")
    cls = cls.mask(f_sn_early.to_numpy(), "Early SN Ia candidate")
    cls = cls.mask(f_kn.to_numpy(), "Kilonova candidate")
    cls = cls.mask(f_r2.to_numpy(), "Solar System candidate")
    if with_tracklet:
        cls = cls.mask(f_tracklet.to_numpy(), "Tracklet")
    cls = cls.mask(f_r3.to_numpy(), "Solar System MPC")
    for flag in (f_mulens, f_sn, f_r2, f_r3):
        amb[flag.to_numpy()] += 1
    cls = cls.mask((amb > 1).to_numpy(), "Ambiguous")
    return pd.Series(np.where(f_simbad, cds, cls))


out["classification_histogram"] = cascade().value_counts().to_dict()
out["unknowns"] = int((cascade(False) == "Unknown").sum())

# ---- hostless blocks (HostlessSpec) ----
cjd = PDF.apply(lambda r: np.array(conc(r, "jd"), dtype=float), axis=1)
cmag = PDF.apply(lambda r: conc(r, "magpsf"), axis=1)


def intra(nobs=2, lapse=12):
    mask = cmag.apply(lambda x: sum(i is not None for i in x[-nobs:])) == nobs
    o = np.zeros(len(PDF), bool)
    o[mask] = cjd[mask].apply(
        lambda x: x[-nobs:][-1] - x[-nobs:][0]) < lapse / 24
    return pd.Series(o)


def inter(nobs=3):
    mask = cmag.apply(lambda x: sum(i is not None for i in x[-nobs:])) == nobs
    o = np.zeros(len(PDF), bool)
    c1 = cjd[mask].apply(lambda x: x[-nobs:][2] - x[-nobs:][1]) > 0.5
    c2 = cjd[mask].apply(lambda x: x[-nobs:][1] - x[-nobs:][0]) < 0.5
    o[mask] = c1 * c2
    return pd.Series(o)


gaia = PDF["DR3Name"] != "nan"
uncat = (f("distnr") > 1.5) & ~f_simbad & ~gaia & (PDF["roid"] != 3)
out["uncataloged"] = int(uncat.sum())
out["intra_cadence"] = int(intra().sum())
out["inter_cadence"] = int(inter().sum())
out["new_hostless_pre_image"] = int((uncat & (f("ndethist") == 1)).sum())
out["intra_hostless_pre_image"] = int(
    (uncat & intra() & (f("ndethist") == 2)).sum())
out["inter_hostless_pre_image"] = int(
    (uncat & inter() & (f("ndethist") == 3)).sum())

# ---- mm module (HistoryAndMmSpec) ----
G = pd.read_parquet("/root/reference/datatest/grb/grb_test_data.parquet")
FINK_EG = ["Kilonova candidate", "SN candidate", "Early SN Ia candidate",
           "Ambiguous"]


def bronze(obs):
    return ((G["rb"] >= 0.7) & G["observatory"].isin(obs)
            & G["fink_class"].isin(EG + FINK_EG))


b = bronze(["Fermi", "SWIFT", "INTEGRAL"])
silver = b & ((1 - G["grb_proba"]) > erf(5 / sqrt(2)))
gold = (silver & (G["rb"] >= 0.9) & (G["grb_loc_error"] / 60 <= 5)
        & (G["rate"].abs() > 0.3))
out["grb_bronze"] = int(b.sum())
out["grb_silver"] = int(silver.sum())
out["grb_gold"] = int(gold.sum())
out["gw_bronze"] = int(bronze(["LVK"]).sum())

print(json.dumps(out, indent=2, default=str))
print("\n(Further suites use the same replication approach: ZTF simple "
      "predicates in dev_goldens.py, Rubin blocks in dev_goldens_rubin.py, "
      "cross-match in dev_goldens_xmatch.py; the photometry-fit suites pin "
      "yso_spicy 6/26, orphan_grb 0/133, rate_based_kn 0/133, early-TDE "
      "prefilter 4/21 + 1/133, magnetic_cvs 1/66.)")
