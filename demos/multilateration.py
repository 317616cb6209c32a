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


class DatumTransformation:
    """Geographic datum transformations (WGS84)."""
    a = 6378137.0              # semi-major axis (equatorial radius, m)
    b = 6356752.31424518       # semi-minor axis (polar radius, m)
    e2 = (a**2 - b**2) / a**2
    e_2 = (a**2 - b**2) / b**2

    @classmethod
    def wgs_to_ecef(cls, latitude, longitude, altitude):
        phi, lambda_, h = radians(latitude), radians(longitude), altitude
        N = cls.a / sqrt(1 - cls.e2 * sin(phi)**2)
        x = (N + h) * cos(phi) * cos(lambda_)
        y = (N + h) * cos(phi) * sin(lambda_)
        z = (N * (1 - cls.e2) + h) * sin(phi)
        return x, y, z

    @classmethod
    def ecef_to_wgs(cls, x, y, z):
        p = hypot(x, y)
        theta = atan2(z * cls.a, p * cls.b)
        phi = atan2(z + cls.e_2 * cls.b * sin(theta)**3,
                    p - cls.e2 * cls.a * cos(theta)**3)
        lambda_ = atan2(y, x)
        N = cls.a / sqrt(1 - cls.e2 * sin(phi)**2)
        h = p / cos(phi) - N
        return degrees(phi), degrees(lambda_), h


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

    datadir = os.path.join(DEMO_DIR, 'data', 'mlat')
    sensors = pd.read_csv(os.path.join(datadir, 'sensors.csv'), index_col=0)

    mpc.run(mpc.start())

    df = pd.concat(pd.read_csv(os.path.join(datadir, f'set_{i}.csv'))
                   for i in args.datasets)
    if args.rows:
        df = df.iloc[:args.rows]
    nrows = len(df)

    l = args.bit_length
    if l is None:
        l = 200 + args.accuracy * 45
    secint = mpc.SecInt(l)
    scaling = 10**args.accuracy
    print(f'Using secure {l}-bit integers: {secint.__name__} '
          f'(scale factor={scaling})')
    distances = [None] * nrows
    for ix, row in enumerate(df.itertuples()):
        # five sensors (parties i=0..4) input location and timestamp:
        locations = [None] * 5
        toas = [None] * 5
        for i, sensor_id in enumerate(list(zip(*eval(row.measurements)))[0]):
            sender_pid = i % len(mpc.parties)
            # on --sim the one process provides every sender's value
            if mpc.pid == sender_pid or getattr(mpc, 'is_simulator', False):
                lla_i = sensors.loc[sensor_id][
                    ['latitude', 'longitude', 'height']].values
                x_i, y_i, z_i = DatumTransformation.wgs_to_ecef(*lla_i)
                position_i = [int(x_i * scaling), int(y_i * scaling),
                              int(z_i * scaling)]
                toas_i = list(zip(*eval(row.measurements)))[1][i]
                toas_i *= SPEED_OF_LIGHT / 1e9
                toas_i = int(toas_i * scaling)
            else:
                position_i = [None] * 3
                toas_i = None
            locations[i] = mpc.input(list(map(secint, position_i)),
                                     senders=sender_pid)
            toas[i] = mpc.input(secint(toas_i), senders=sender_pid)

        x, y, z = schmidt_multilateration(secint, locations, toas)
        x, y, z = x / scaling, y / scaling, z / scaling
        latitude, longitude, _ = DatumTransformation.ecef_to_wgs(x, y, z)
        altitude = row.geoAltitude  # fix altitude to reported altitude
        d = dist(DatumTransformation.wgs_to_ecef(latitude, longitude, altitude),
                 DatumTransformation.wgs_to_ecef(row.latitude, row.longitude,
                                                 altitude))
        distances[ix] = d
        print(f'Processing {nrows} measurements from sets '
              f'{"+".join(args.datasets)}: {round(100*(ix + 1)/nrows)}%',
              end='\r')
    print()

    mpc.run(mpc.shutdown())

    distances = pd.Series(distances)
    print('Location Error [m]:')
    print(distances.describe())
    assert distances.median() < 2000, 'median location error too large'


if __name__ == '__main__':
    main()
