"""Demo: privacy-preserving multilateration (MLAT) via Schmidt's method.

Counterpart of the reference demos/multilateration.py (D. Moser, "The
Oblivious Sensor Network", ETH PhD thesis 2021, ch. 5): five sensors
secret-share their locations and time-of-arrival measurements; the
aircraft position is computed as the least-squares solution of the
(5 choose 3) = 10 Schmidt linear equations, solved with the blinded
Bareiss linear_solve from demos/ridgeregression.py, entirely over a
335-bit prime field (SecInt335 for 3 decimal places).

TPU-first note: all 10 equations of one measurement are formed by a
single stacked secure matmul over the combination axis instead of ten
1x3-by-3x4 products — the per-measurement round count is constant.

Usage: python demos/multilateration.py [-M m] [-i I [I ...]] [-a A]
         [-l L] [-k K]
  -k caps the number of measurements (default: all in the datasets).
"""
import argparse
import itertools
import os
import sys
from math import atan2, cos, degrees, dist, hypot, radians, sin, sqrt

DEMO_DIR = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(DEMO_DIR, '..'))
sys.path.insert(0, DEMO_DIR)

import numpy as np
import pandas as pd

SPEED_OF_LIGHT = 299792458.0  # m/s (scipy.constants.speed_of_light)

from ridgeregression import linear_solve
from mpyc_tpu.runtime import mpc


# --- WGS84 <-> ECEF datum conversions (standard geodesy formulas) ----
_WGS84_A = 6378137.0             # equatorial radius [m]
_WGS84_B = 6356752.31424518      # polar radius [m]
_ECC2 = 1 - (_WGS84_B / _WGS84_A) ** 2          # first eccentricity^2
_ECC2P = (_WGS84_A / _WGS84_B) ** 2 - 1         # second eccentricity^2


def wgs84_to_ecef(lat_deg, lon_deg, height):
    """Geodetic coordinates -> earth-centered earth-fixed XYZ [m]."""
    lat, lon = radians(lat_deg), radians(lon_deg)
    prime_vertical = _WGS84_A / sqrt(1 - _ECC2 * sin(lat) ** 2)
    rho = (prime_vertical + height) * cos(lat)
    return (rho * cos(lon),
            rho * sin(lon),
            (prime_vertical * (1 - _ECC2) + height) * sin(lat))


def ecef_to_wgs84(x, y, z):
    """ECEF XYZ [m] -> geodetic (lat deg, lon deg, height m), via the
    closed-form Bowring approximation."""
    rho = hypot(x, y)
    beta = atan2(z * _WGS84_A, rho * _WGS84_B)
    lat = atan2(z + _ECC2P * _WGS84_B * sin(beta) ** 3,
                rho - _ECC2 * _WGS84_A * cos(beta) ** 3)
    prime_vertical = _WGS84_A / sqrt(1 - _ECC2 * sin(lat) ** 2)
    return (degrees(lat), degrees(atan2(y, x)),
            rho / cos(lat) - prime_vertical)


def schmidt_multilateration(secint, locations, toas):
    """Schmidt's multilateration: position from 5 locations + ToAs."""
    # stack sensors as one secure (5, 5) array [x, y, z, |p|^2, toa]
    P = mpc.np_fromlist([a for p in locations for a in p]).reshape(5, 3)
    N = mpc.np_sum(P * P, axis=1)                        # squared norms
    T = mpc.np_fromlist(toas)
    combos = list(itertools.combinations(range(5), 3))
    C = len(combos)
    # Delta[c] = [t_j - t_k, t_k - t_i, t_i - t_j] per combination c
    sel = np.zeros((C, 3, 5))
    for c, (i, j, k) in enumerate(combos):
        sel[c, 0, j], sel[c, 0, k] = 1, -1
        sel[c, 1, k], sel[c, 1, i] = 1, -1
        sel[c, 2, i], sel[c, 2, j] = 1, -1
    Delta = mpc.np_matmul(secint.array(sel.astype(object)), T)  # (C, 3)
    # XYZN[c] = rows i,j,k of [P | N]  -> one (C, 3, 4) stacked pick
    PN = mpc.np_concatenate((P, mpc.np_transpose(N.reshape(1, 5))), axis=1)
    pick = np.zeros((C, 3, 5))
    for c, (i, j, k) in enumerate(combos):
        pick[c, 0, i] = pick[c, 1, j] = pick[c, 2, k] = 1
    XYZN = mpc.np_matmul(secint.array(pick.astype(object)), PN)  # (C, 3, 4)
    # r[c] = Delta[c] @ XYZN[c]: ONE batched secure matmul for all combos
    R = mpc.np_matmul(Delta.reshape(C, 1, 3), XYZN).reshape(C, 4)
    A = R[:, :3] * 2                                      # (C, 3)
    b = mpc.np_prod(Delta, axis=1) + R[:, 3]              # (C,)
    # least squares: solve A^T A w = A^T b
    AT = mpc.np_transpose(A)
    ATA = AT @ A                                          # (3, 3)
    ATb = AT @ mpc.np_transpose(b.reshape(1, C))          # (3, 1)
    ATA_l = [[mpc.np_getitem(ATA, (i, j)) for j in range(3)]
             for i in range(3)]
    ATb_l = [[mpc.np_getitem(ATb, (i, 0))] for i in range(3)]
    w_det = linear_solve(ATA_l, ATb_l)
    x, y, z, det = (int(v) for v in mpc.run(mpc.output(w_det)))
    return x / det, y / det, z / det


def _sensor_inputs(measurement, sensors, scale, secint):
    """Share each sensor's scaled ECEF position and ToA into the MPC.

    ``measurement`` is the parsed [(sensor_id, toa_ns), ...] list of one
    row; sensor i's values are input by party i mod m (on the co-located
    plane the single process supplies every sender's data).
    """
    sim = getattr(mpc, 'is_simulator', False)
    m = len(mpc.parties)
    locations, toas = [], []
    for i, (sensor_id, toa_ns, *_rest) in enumerate(measurement):
        owner = i % m
        pos_fx = [None] * 3
        toa_fx = None
        if sim or mpc.pid == owner:
            lat, lon, h = sensors.loc[sensor_id][
                ['latitude', 'longitude', 'height']]
            pos_fx = [round(c * scale) for c in wgs84_to_ecef(lat, lon, h)]
            toa_fx = round(toa_ns * (SPEED_OF_LIGHT / 1e9) * scale)
        locations.append(mpc.input([secint(c) for c in pos_fx],
                                   senders=owner))
        toas.append(mpc.input(secint(toa_fx), senders=owner))
    return locations, toas


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--datasets', metavar='I', nargs='+',
                        help='datasets (default = 1 3)')
    parser.add_argument('-a', '--accuracy', type=int, metavar='A',
                        help='accuracy A (number of decimal places), A>=0')
    parser.add_argument('-l', '--bit-length', type=int, metavar='L',
                        help='override automatically set bit length')
    parser.add_argument('-k', '--rows', type=int, metavar='K', default=0,
                        help='cap the number of measurements (0 = all)')
    parser.set_defaults(datasets=('1', '3'), accuracy=3)
    args, _ = parser.parse_known_args()

    mlat_dir = os.path.join(DEMO_DIR, 'data', 'mlat')
    sensors = pd.read_csv(os.path.join(mlat_dir, 'sensors.csv'), index_col=0)
    frames = pd.concat(pd.read_csv(os.path.join(mlat_dir, f'set_{i}.csv'))
                       for i in args.datasets)
    if args.rows:
        frames = frames.head(args.rows)

    bits = args.bit_length or 200 + args.accuracy * 45
    scale = 10**args.accuracy

    mpc.run(mpc.start())
    secint = mpc.SecInt(bits)
    print(f'Using secure {bits}-bit integers: {secint.__name__} '
          f'(scale factor={scale})')

    tag = '+'.join(args.datasets)
    total = len(frames)
    errors = []
    for row in frames.itertuples():
        measurement = list(eval(row.measurements))
        locations, toas = _sensor_inputs(measurement, sensors, scale, secint)
        ecef = schmidt_multilateration(secint, locations, toas)
        est_lat, est_lon, _ = ecef_to_wgs84(*(c / scale for c in ecef))
        # compare at the aircraft's reported altitude
        alt = row.geoAltitude
        errors.append(dist(wgs84_to_ecef(est_lat, est_lon, alt),
                           wgs84_to_ecef(row.latitude, row.longitude, alt)))
        done = len(errors)
        print(f'Processing {total} measurements from sets {tag}: '
              f'{round(100 * done / total)}%', end='\r')
    print()
    mpc.run(mpc.shutdown())

    stats = pd.Series(errors)
    print('Location Error [m]:')
    print(stats.describe())
    assert stats.median() < 2000, 'median location error too large'


if __name__ == '__main__':
    main()
