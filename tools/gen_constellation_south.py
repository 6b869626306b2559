# Generates the deep-south rows of graft/astro/SouthRows.scala:
# modern J2000 IAU dec-band decompositions, numerically precessed to
# B1875 (IAU-1976 angles) to match the Roman 1987 table frame.
import math
T = (2405889.25855 - 2451545.0) / 36525.0
zeta  = (2306.2181*T + 0.30188*T*T + 0.017998*T**3) / 3600.0
z     = (2306.2181*T + 1.09468*T*T + 0.018203*T**3) / 3600.0
theta = (2004.3109*T - 0.42665*T*T - 0.041833*T**3) / 3600.0
d2r = math.pi/180

def precess(ra_h, dec_d):
    ra = ra_h*15*d2r; dec = dec_d*d2r
    zr, zzr, thr = zeta*d2r, z*d2r, theta*d2r
    A = math.cos(dec)*math.sin(ra+zr)
    B = math.cos(thr)*math.cos(dec)*math.cos(ra+zr) - math.sin(thr)*math.sin(dec)
    C = math.sin(thr)*math.cos(dec)*math.cos(ra+zr) + math.cos(thr)*math.sin(dec)
    ra2 = (math.atan2(A, B) + zzr) / d2r / 15.0 % 24.0
    dec2 = math.asin(C) / d2r
    return ra2, dec2

bands = [
 (-45.5, [(23.43,24,'Phe'),(0,2.37,'Phe'),(2.37,3.95,'Eri'),(3.95,4.38,'Hor'),
          (4.38,5.05,'Cae'),(5.05,6.55,'Pic'),(6.55,8.1,'Pup'),
          (8.1,11.08,'Vel'),(11.08,14.5,'Cen'),(14.5,16.05,'Lup'),
          (16.05,16.6,'Nor'),(16.6,18.0,'Ara'),(18.0,20.35,'Tel'),
          (20.35,21.45,'Ind'),(21.45,23.43,'Gru')]),
 (-48.5, [(23.43,24,'Phe'),(0,1.9,'Phe'),(1.9,3.6,'Eri'),(3.6,4.5,'Hor'),
          (4.5,5.0,'Cae'),(5.0,6.3,'Pic'),(6.3,8.1,'Pup'),(8.1,11.05,'Vel'),
          (11.05,14.5,'Cen'),(14.5,16.05,'Lup'),(16.05,16.55,'Nor'),
          (16.55,18.1,'Ara'),(18.1,20.4,'Tel'),(20.4,21.45,'Ind'),
          (21.45,23.43,'Gru')]),
 (-50.2, [(23.44,24,'Phe'),(0,1.5,'Phe'),(1.5,3.5,'Eri'),(3.5,4.4,'Hor'),
          (4.4,5.1,'Dor'),(5.1,6.3,'Pic'),(6.3,8.1,'Pup'),(8.1,11.05,'Vel'),
          (11.05,14.5,'Cen'),(14.5,16.0,'Lup'),(16.0,16.58,'Nor'),
          (16.58,18.12,'Ara'),(18.12,20.45,'Tel'),(20.45,21.45,'Ind'),
          (21.45,23.44,'Gru')]),
 (-52.0, [(23.45,24,'Phe'),(0,1.5,'Phe'),(1.5,3.35,'Eri'),(3.35,4.3,'Hor'),
          (4.3,5.55,'Dor'),(5.55,6.2,'Pic'),(6.2,8.2,'Car'),(8.2,10.4,'Vel'),
          (10.4,11.05,'Car'),(11.05,14.85,'Cen'),(14.85,15.85,'Lup'),
          (15.85,16.58,'Nor'),(16.58,18.15,'Ara'),(18.15,20.5,'Tel'),
          (20.5,21.45,'Ind'),(21.45,23.45,'Gru')]),
 (-54.0, [(23.45,24,'Phe'),(0,1.55,'Phe'),(1.55,2.85,'Eri'),(2.85,3.2,'Hor'),
          (3.2,4.55,'Ret'),(4.55,5.6,'Dor'),(5.6,6.2,'Pic'),(6.2,8.5,'Car'),
          (8.5,10.4,'Vel'),(10.4,11.2,'Car'),(11.2,15.05,'Cen'),
          (15.05,15.45,'Lup'),(15.45,16.55,'Nor'),(16.55,18.15,'Ara'),
          (18.15,20.5,'Tel'),(20.5,21.45,'Ind'),(21.45,23.45,'Gru')]),
 (-56.0, [(21.9,23.45,'Tuc'),(23.45,24,'Phe'),(0,1.4,'Phe'),(1.4,2.75,'Eri'),
          (2.75,3.25,'Hor'),(3.25,4.55,'Ret'),(4.55,5.85,'Dor'),
          (5.85,6.3,'Pic'),(6.3,8.55,'Car'),(8.55,10.4,'Vel'),
          (10.4,11.3,'Car'),(11.3,11.93,'Cen'),(11.93,12.96,'Cru'),
          (12.96,15.1,'Cen'),(15.1,15.75,'Cir'),(15.75,16.5,'Nor'),
          (16.5,18.15,'Ara'),(18.15,20.43,'Tel'),(20.43,21.9,'Ind')]),
 (-57.3, [(22.0,24,'Tuc'),(0,1.4,'Phe'),(1.4,2.6,'Eri'),(2.6,3.25,'Hor'),
          (3.25,4.55,'Ret'),(4.55,5.85,'Dor'),(5.85,6.4,'Pic'),
          (6.4,8.55,'Car'),(8.55,10.4,'Vel'),(10.4,11.35,'Car'),
          (11.35,11.93,'Cen'),(11.93,12.96,'Cru'),(12.96,15.1,'Cen'),
          (15.1,15.9,'Cir'),(15.9,16.45,'Nor'),(16.45,18.1,'Ara'),
          (18.1,21.45,'Pav'),(21.45,22.0,'Ind')]),
 (-58.0, [(22.1,24,'Tuc'),(0,1.4,'Tuc'),(1.4,3.3,'Hyi'),(3.3,4.5,'Ret'),
          (4.5,5.9,'Dor'),(5.9,6.5,'Pic'),(6.5,11.4,'Car'),
          (11.4,11.93,'Cen'),(11.93,12.96,'Cru'),(12.96,15.15,'Cen'),
          (15.15,16.0,'Cir'),(16.0,16.45,'Nor'),(16.45,18.1,'Ara'),
          (18.1,21.55,'Pav'),(21.55,22.1,'Ind')]),
 (-60.5, [(22.3,24,'Tuc'),(0,1.4,'Tuc'),(1.4,3.45,'Hyi'),(3.45,4.5,'Ret'),
          (4.5,5.95,'Dor'),(5.95,6.85,'Pic'),(6.85,11.2,'Car'),
          (11.2,11.93,'Cen'),(11.93,12.96,'Cru'),(12.96,14.9,'Cen'),
          (14.9,15.6,'Cir'),(15.6,17.1,'TrA'),(17.1,18.1,'Ara'),
          (18.1,21.4,'Pav'),(21.4,22.3,'Ind')]),
 (-63.0, [(22.5,24,'Tuc'),(0,1.4,'Tuc'),(1.4,3.55,'Hyi'),(3.55,4.6,'Ret'),
          (4.6,6.0,'Dor'),(6.0,6.9,'Pic'),(6.9,11.3,'Car'),
          (11.3,11.93,'Cen'),(11.93,12.96,'Cru'),(12.96,14.75,'Cen'),
          (14.75,15.4,'Cir'),(15.4,17.05,'TrA'),(17.05,18.05,'Ara'),
          (18.05,21.3,'Pav'),(21.3,22.5,'Ind')]),
 (-64.65, [(11.93,12.96,'Cru'),(12.96,14.3,'Cen')]),
 (-64.9, [(22.8,24,'Tuc'),(0,1.4,'Tuc'),(1.4,3.7,'Hyi'),(3.7,4.8,'Ret'),
          (4.8,6.6,'Dor'),(6.6,9.1,'Vol'),(9.1,11.3,'Car'),
          (11.3,13.85,'Mus'),(13.85,15.2,'Cir'),(15.2,17.0,'TrA'),
          (17.0,18.0,'Ara'),(18.0,21.2,'Pav'),(21.2,22.8,'Ind')]),
 (-67.5, [(23.0,24,'Tuc'),(0,1.4,'Tuc'),(1.4,4.9,'Hyi'),(4.9,6.4,'Dor'),
          (6.4,9.1,'Vol'),(9.1,11.3,'Car'),(11.3,13.8,'Mus'),
          (13.8,14.72,'Cir'),(14.72,17.05,'TrA'),(17.05,17.95,'Ara'),
          (17.95,18.25,'Aps'),(18.25,21.1,'Pav'),(21.1,23.0,'Ind')]),
 (-70.0, [(23.0,24,'Tuc'),(0,1.4,'Tuc'),(1.4,3.3,'Hyi'),(3.3,7.2,'Men'),
          (7.2,9.1,'Vol'),(9.1,11.0,'Car'),(11.0,13.8,'Mus'),
          (13.8,14.7,'Cir'),(14.7,17.0,'TrA'),(17.0,18.3,'Aps'),
          (18.3,21.0,'Pav'),(21.0,23.0,'Ind')]),
 (-72.5, [(23.0,24,'Tuc'),(0,1.4,'Tuc'),(1.4,3.5,'Hyi'),(3.5,7.3,'Men'),
          (7.3,9.1,'Vol'),(9.1,10.8,'Car'),(10.8,13.8,'Mus'),
          (13.8,18.3,'Aps'),(18.3,21.0,'Pav'),(21.0,23.0,'Ind')]),
 # Hydrus' west boundary is RA 00h06.1m (J2000), NOT 0h: the sliver
 # west of it belongs to Octans (theta Oct, RA 00h01.6m dec -77.06,
 # is the classic stress point).
 (-75.5, [(0.0,0.102,'Oct'),(0.102,3.85,'Hyi'),(3.85,7.75,'Men'),
          (7.75,13.9,'Cha'),(13.9,18.3,'Aps'),(18.3,24,'Oct')]),
 (-80.0, [(0.0,0.102,'Oct'),(0.102,2.9,'Hyi'),(2.9,4.0,'Oct'),
          (4.0,7.5,'Men'),(7.5,13.9,'Cha'),
          (13.9,18.0,'Aps'),(18.0,24,'Oct')]),
 (-83.5, [(4.0,7.5,'Men'),(7.5,24,'Oct'),(0.0,4.0,'Oct')]),
]

# Stair-step refinement: the true boundaries are constant-RA segments
# in B1875, so between two sampled J2000 dec bands the boundary RA
# drifts smoothly; a single band per ~3 deg approximates that drift as
# one step of up to ~1 deg. Where adjacent bands share the same
# constellation sequence, insert linearly-interpolated intermediate
# bands until the dec spacing is <= MAX_SPACING, which bounds the
# per-band step error by drift * spacing / span / 2 (measured worst
# boundary drift ~1 deg over 3 deg -> error ~0.08 deg at 0.5 deg
# spacing). Structurally-different neighbors (corners appear/vanish)
# keep the original single step.
MAX_SPACING = 0.5

def subdivided(bands):
    out = []
    for i, (dec_low, rows) in enumerate(bands):
        out.append((dec_low, rows))
        if i + 1 >= len(bands):
            continue
        dec_next, rows_next = bands[i + 1]
        if [r[2] for r in rows] != [r[2] for r in rows_next]:
            continue
        span = dec_low - dec_next
        k = int(math.ceil(span / MAX_SPACING)) - 1
        for j in range(1, k + 1):
            t = j / (k + 1)
            mid = [(lo1 + t * (lo2 - lo1), hi1 + t * (hi2 - hi1), a1)
                   for (lo1, hi1, a1), (lo2, hi2, _) in zip(rows, rows_next)]
            out.append((dec_low - t * span, mid))
    return out

def emit(r1, r2, dl, abbr):
    print(f"{r1:7.4f} {r2:7.4f} {dl:8.4f} {abbr}")

for dec_low, rows in subdivided(bands):
    for raLo, raHi, abbr in rows:
        r1, d1 = precess(raLo, dec_low)
        # raHi == 24 precesses as RA 0 (same point on the sphere): the
        # segment's true B1875 end is ~23.89h, and the [23.89, 24) B1875
        # sliver belongs to whichever constellation owns J2000 RA 0+ in
        # this band — its wrap-split row covers it. Snapping r2 back to
        # 24.0 here (the old behavior) shadowed that row wherever the
        # RA-24 and RA-0 segments name DIFFERENT constellations (e.g.
        # Tuc|Phe near dec -57: a 1.6h x 1.3deg sliver misassigned Tuc).
        r2, d2 = precess(raHi % 24.0, dec_low)
        dl = (d1 + d2) / 2.0
        if r1 > r2:
            # the interval precessed across RA 0: split into two rows
            # (a row with raLo > raHi would never match; the old
            # snap-raLo-to-0 hack instead covered the whole band for
            # sub-0.1h slivers that land entirely below RA 24)
            emit(r1, 24.0, dl, abbr)
            if r2 > 0:
                emit(0.0, r2, dl, abbr)
        else:
            emit(r1, r2, dl, abbr)
print(" 0.0000 24.0000 -90.0000 Oct")
