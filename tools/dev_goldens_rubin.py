#!/usr/bin/env python3
"""DEV-ONLY Rubin golden-count generator (not part of the shipped library).

Replicates the reference's Rubin block/filter predicate logic
(fink_filters/rubin/blocks.py, rubin/livestream/*/filter.py) in
pandas/numpy against the actual 27-alert fixture
(datatest/rubin_test_data_10_0.parquet), to pin expected counts in the
ScalaTest suites. Galactic coordinates and the flat-LambdaCDM distance
modulus use the standard published formulas (high-resolution quadrature
here, so the Scala Simpson-64 approximation is checked against an
independent finer integration).

Run: python3 tools/dev_goldens_rubin.py
"""
import json

import numpy as np
import pandas as pd

DF = pd.read_parquet("/root/reference/datatest/rubin_test_data_10_0.parquet")
DS = pd.json_normalize(DF["diaSource"])
DO = pd.json_normalize(DF["diaObject"])
XM = pd.json_normalize(DF["xm"])
CLF = pd.json_normalize(DF["clf"])
PRED = pd.json_normalize(DF["pred"])
MISC = pd.json_normalize(DF["misc"])

EG_HOSTS = ["Unknown", "Candidate_SN*", "SN", "SN candidate",
            "galaxy", "Galaxy", "EmG", "Seyfert", "Seyfert_1", "Seyfert_2",
            "BlueCompG", "StarburstG", "LSB_G", "HII_G", "High_z_G",
            "GinPair", "GinGroup", "BClG", "GinCl", "PartofG"]
BAD_VALUES = ["Unknown", "Fail", "Fail 504", None, np.nan]
ZP_NJY = 31.4


def galactic_b(ra, dec):
    # ICRS -> galactic latitude, J2000 NGP (192.85948, 27.12825) deg
    d2r = np.pi / 180.0
    ngp_ra, ngp_dec = 192.85948, 27.12825
    sb = (np.sin(dec * d2r) * np.sin(ngp_dec * d2r)
          + np.cos(dec * d2r) * np.cos(ngp_dec * d2r)
          * np.cos((ra - ngp_ra) * d2r))
    return np.arcsin(sb) / d2r


def distance_modulus(z, n=200000):
    # flat LambdaCDM H0=70, Om=0.3; fine trapezoid integration
    c, H0, Om = 299792.458, 70.0, 0.3
    out = np.full_like(np.asarray(z, float), np.nan)
    for i, zz in enumerate(np.atleast_1d(z)):
        if not np.isfinite(zz) or zz <= 0:
            continue
        grid = np.linspace(0, zz, n)
        integ = np.trapz(1.0 / np.sqrt(Om * (1 + grid) ** 3 + (1 - Om)), grid)
        dl_mpc = (c / H0) * integ * (1 + zz)
        out[i] = 5 * np.log10(dl_mpc) + 25
    return out


def flux_to_mag(flux):
    flux = np.asarray(flux, float)
    mag = np.full_like(flux, np.nan)
    ok = (flux > 0) & np.isfinite(flux)
    mag[ok] = -2.5 * np.log10(flux[ok]) + ZP_NJY
    return mag


# ---- blocks ----
b_sso = PRED["is_sso"].fillna(False).astype(bool)
gb = galactic_b(DS["ra"].astype(float).values, DS["dec"].astype(float).values)
b_plane20 = pd.Series(np.abs(gb) > 20)
b_plane5 = pd.Series(np.abs(gb) > 5)
b_simbad_galaxy = XM["simbad_otype"].isin(EG_HOSTS)
b_simbad_unknown = XM["simbad_otype"].isin(BAD_VALUES)
b_mangrove = XM["mangrove_lum_dist"] > 0
b_gaia_star = (~XM["gaiadr3_DR3Name"].isin(BAD_VALUES)
               & (XM["gaiadr3_Plx"] / XM["gaiadr3_e_Plx"] > 5))
b_vsx_star = pd.Series(False, index=DF.index)  # fixture: vsx_Type all null
b_new = DS["midpointMjdTai"] == MISC["firstDiaSourceMjdTaiFink"]

flags = ["isDipole", "pixelFlags", "pixelFlags_bad", "pixelFlags_saturated",
         "pixelFlags_streakCenter", "pixelFlags_interpolated", "pixelFlags_cr",
         "pixelFlags_nodata", "pixelFlags_streak", "pixelFlags_edge",
         "psfFlux_flag", "apFlux_flag", "forced_PsfFlux_flag",
         "forced_PsfFlux_flag_edge", "shape_flag", "centroid_flag"]
mask_flagged = pd.Series(False, index=DF.index)
for f in flags:
    mask_flagged |= DS[f].fillna(False).astype(bool)
mask_flagged |= (DS["psfFlux"] < 0) | (DS["psfFlux"] / DS["psfFluxErr"] < 6)
b_good_quality = ~mask_flagged

band_mean = pd.Series([
    DO.loc[i, f"{DS.loc[i, 'band']}_psfFluxMean"]
    if f"{DS.loc[i, 'band']}_psfFluxMean" in DO.columns else np.nan
    for i in DF.index])
band_meanerr = pd.Series([
    DO.loc[i, f"{DS.loc[i, 'band']}_psfFluxMeanErr"]
    if f"{DS.loc[i, 'band']}_psfFluxMeanErr" in DO.columns else np.nan
    for i in DF.index])
diff = DS["psfFlux"] - band_mean
signif = np.abs(diff) > band_meanerr
b_rising = signif & (diff > 0)
b_fading = signif & (diff < 0)

mask_legacy_valid = ((XM["legacydr8_zphot"] > 0)
                     & (b_simbad_unknown | b_simbad_galaxy))
not_star = ~b_gaia_star.fillna(False) & ~b_vsx_star
eg_near = (b_good_quality
           & (b_simbad_galaxy | b_mangrove.fillna(False) | mask_legacy_valid)
           & b_plane20 & ~b_sso & not_star)
eg_loose = (b_good_quality
            & (b_simbad_galaxy | b_mangrove.fillna(False) | mask_legacy_valid
               | b_simbad_unknown)
            & b_plane20 & ~b_sso & not_star)

goldens = {
    "b_is_solar_system": int(b_sso.sum()),
    "b_outside_galactic_plane_20_deg": int(b_plane20.sum()),
    "b_outside_galactic_plane_5_deg": int(b_plane5.sum()),
    "b_xmatched_simbad_galaxy": int(b_simbad_galaxy.sum()),
    "b_xmatched_simbad_unknown": int(b_simbad_unknown.sum()),
    "b_xmatched_mangrove": int((b_mangrove.fillna(False)).sum()),
    "b_xmatched_gaia_star": int(b_gaia_star.fillna(False).sum()),
    "b_is_new": int(b_new.fillna(False).sum()),
    "b_good_quality": int(b_good_quality.sum()),
    "b_is_rising": int((b_rising.fillna(False)).sum()),
    "b_is_fading": int((b_fading.fillna(False)).sum()),
    "b_extragalactic_near_galaxy_candidate": int(eg_near.sum()),
    "b_extragalactic_loose_candidate": int(eg_loose.sum()),
}

# ---- livestream filters ----
goldens["uniform_sample"] = int((DF["diaSourceId"] % 113 == 0).sum())
goldens["in_tns"] = 0  # xm.tns_fullname absent from fixture -> no matches

mag_now = pd.Series(flux_to_mag(DS["psfFlux"].values))
goldens["hostless_candidate"] = int(
    (b_good_quality & (CLF["elephant_kstest_template"] < 0.95)
     & b_plane20 & (mag_now <= 21.5)).fillna(False).sum())

f_gq_neg = b_good_quality & ~DS["isNegative"].fillna(False).astype(bool)
goldens["most_likely_sn"] = int(
    ((CLF["snnSnVsOthers_score"] >= 0.7) & (CLF["cats_class"] == 11)
     & (CLF["cats_score"] >= 0.9) & ~b_sso & (DS["snr"] > 10)
     & ~f_gq_neg & (DO["nDiaSources"] >= 2)).fillna(False).sum())
goldens["remove_unlikely_transients"] = int(
    (~b_sso & (DS["snr"] > 10) & ~f_gq_neg
     & (DO["nDiaSources"] >= 2)).fillna(False).sum())

f_new5 = (DS["midpointMjdTai"] - MISC["firstDiaSourceMjdTaiFink"]) < 5.0
f_bright24 = mag_now < 24
goldens["extragalactic_svom"] = int(
    (eg_near & f_new5 & f_bright24).fillna(False).sum())

f_sampling_lt20 = ((DO["nDiaSources"] > 4)
                   & (DS["midpointMjdTai"] - MISC["firstDiaSourceMjdTaiFink"] > 1))
goldens["extragalactic_lt20mag_candidate"] = int(
    (eg_loose & (mag_now < 20) & b_rising.fillna(False)
     & f_sampling_lt20).fillna(False).sum())

# extragalactic_new_candidate: rate cuts against latest same-band prv source
prev_flux, prev_time = [], []
for i in DF.index:
    srcs = DF.loc[i, "prvDiaSources"]
    band = DS.loc[i, "band"]
    best = None
    if srcs is not None and len(srcs) > 0:
        same = [s for s in srcs if s["band"] == band]
        if same:
            best = max(same, key=lambda s: s["midpointMjdTai"])
    prev_flux.append(best["psfFlux"] if best else np.nan)
    prev_time.append(best["midpointMjdTai"] if best else np.nan)
prev_flux = pd.Series(prev_flux)
prev_time = pd.Series(prev_time)
has2 = pd.Series([
    (DO.loc[i, f"{DS.loc[i, 'band']}_psfFluxNdata"] >= 2)
    if f"{DS.loc[i, 'band']}_psfFluxNdata" in DO.columns else False
    for i in DF.index]).fillna(False)
delta_mag = pd.Series(flux_to_mag(DS["psfFlux"].values)) - pd.Series(
    flux_to_mag(prev_flux.values))
delta_time = DS["midpointMjdTai"] - prev_time
rate = delta_mag / delta_time
dt_rising = DS["midpointMjdTai"] - MISC["firstDiaSourceMjdTaiFink"]
f_rising_rate = (rate < -0.2) & (dt_rising < 3)
f_fading_ri = DS["band"].isin(["r", "i"]) & (rate > 0.2)
f_fading_gu = DS["band"].isin(["g", "u"]) & (rate > 0.5)
f_rate = f_rising_rate | f_fading_ri | f_fading_gu
goldens["extragalactic_new_candidate"] = int(
    (eg_near & f_new5 & has2 & f_bright24 & f_rate).fillna(False).sum())

# sn_near_galaxy: peak absolute magnitude in (-23, -13)
max_flux = DO[[f"{b}_psfFluxMax" for b in "giruzy"]].max(axis=1)
m_app = flux_to_mag(max_flux.values)
mabs = m_app - distance_modulus(XM["legacydr8_zphot"].values)
f_mabs = pd.Series((mabs > -23) & (mabs < -13))
goldens["sn_near_galaxy_candidate"] = int(
    (eg_near & (DO["nDiaSources"] > 5) & f_mabs).fillna(False).sum())

print(json.dumps(goldens, indent=2))
