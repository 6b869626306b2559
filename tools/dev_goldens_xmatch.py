#!/usr/bin/env python3
"""DEV-ONLY cross-match golden generator (not part of the shipped library).

Replicates nearest-neighbour-within-radius cross-match (the semantics of
fink-science's `cross_match_astropy`: astropy match_to_catalog_sky = global
nearest, then the radius gate) in numpy against the reference's packaged
catalogs and datatest fixtures, to pin expected counts for the Scala
CrossMatch operator.

Note: the reference's symbiotic doctest reports 19/20 due to an artifact
its own comments flag ("two alerts ... are merged ... WTF?",
filter_symbiotic_stars/filter.py:68-75). We pin the CLEAN count here and
document the divergence.
"""
import numpy as np
import pandas as pd


def sep_deg(ra1, dec1, ra2, dec2):
    d2r = np.pi / 180.0
    dra = (ra2 - ra1) * d2r / 2.0
    ddec = (dec2 - dec1) * d2r / 2.0
    a = (np.sin(ddec) ** 2
         + np.cos(dec1 * d2r) * np.cos(dec2 * d2r) * np.sin(dra) ** 2)
    return np.arcsin(np.sqrt(a)) * 2.0 / d2r


def nearest_match(ra, dec, cra, cdec, radius_arcsec):
    """For each (ra, dec): index of nearest catalog row if within its
    radius, else -1."""
    out = np.full(len(ra), -1)
    for i in range(len(ra)):
        seps = sep_deg(ra[i], dec[i], cra, cdec) * 3600.0
        j = int(np.argmin(seps))
        r = radius_arcsec[j] if hasattr(radius_arcsec, "__len__") \
            else radius_arcsec
        if seps[j] < r:
            out[i] = j
    return out


def hms_to_deg(s):
    h, m, sec = [float(x) for x in str(s).split()]
    return (h + m / 60 + sec / 3600) * 15.0


def dms_to_deg(s):
    parts = str(s).split()
    sign = -1.0 if parts[0].strip().startswith("-") else 1.0
    d = abs(float(parts[0]))
    return sign * (d + float(parts[1]) / 60 + float(parts[2]) / 3600)


# --- known TDE: datatest/tde vs packaged tde.parquet, 5", positive only
tde_alerts = pd.read_parquet("/root/reference/datatest/tde")
cand = tde_alerts["candidate"]
ra = cand.apply(lambda x: x["ra"]).to_numpy(float)
dec = cand.apply(lambda x: x["dec"]).to_numpy(float)
pos = cand.apply(lambda x: x["isdiffpos"] in ("t", "1")).to_numpy(bool)
tde_cat = pd.read_parquet(
    "/root/reference/fink_filters/ztf/filter_known_tde/data/tde.parquet")
m = nearest_match(ra[pos], dec[pos],
                  tde_cat["ra"].to_numpy(float),
                  tde_cat["dec"].to_numpy(float), 5.0)
print("known_tde: alerts", len(tde_alerts), "positive", int(pos.sum()),
      "matches", int((m >= 0).sum()),
      "names", [tde_cat['name'].iloc[j] for j in m if j >= 0])

# --- symbiotic: datatest/symbiotic vs symbiotic_and_cataclysmic, per-row
sym_alerts = pd.read_parquet("/root/reference/datatest/symbiotic")
c2 = sym_alerts["candidate"]
ra2 = c2.apply(lambda x: x["ra"]).to_numpy(float)
dec2 = c2.apply(lambda x: x["dec"]).to_numpy(float)
sym = pd.read_parquet(
    "/root/reference/fink_filters/data/symbiotic_and_cataclysmic.parquet")
sra = sym["RA(J2000)"].apply(hms_to_deg).to_numpy()
sdec = sym["DEC(J2000)"].apply(dms_to_deg).to_numpy()
m2 = nearest_match(ra2, dec2, sra, sdec, sym["Radius"].to_numpy(float))
print("symbiotic: alerts", len(sym_alerts),
      "matches", int((m2 >= 0).sum()))

# --- dwarf AGN: datatest/dwarf_agn vs list_dwarfs_AGN_RADEC, per-row Re_arc
da = pd.read_parquet("/root/reference/datatest/dwarf_agn")
c3 = da["candidate"]
ra3 = c3.apply(lambda x: x["ra"]).to_numpy(float)
dec3 = c3.apply(lambda x: x["dec"]).to_numpy(float)
lsb = pd.read_parquet(
    "/root/reference/fink_filters/data/list_dwarfs_AGN_RADEC.parquet")
m3 = nearest_match(ra3, dec3, lsb["RA"].to_numpy(float),
                   lsb["DEC"].to_numpy(float), lsb["Re_arc"].to_numpy(float))
print("dwarf_agn: alerts", len(da), "matches", int((m3 >= 0).sum()),
      "ids", [lsb['MaNGAID'].iloc[j] for j in m3 if j >= 0])
