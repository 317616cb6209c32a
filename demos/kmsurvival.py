"""Demo: Privacy-preserving Kaplan-Meier survival analysis + logrank test.

Counterpart of the reference demos/kmsurvival.py (Veeningen,
AFRICACRYPT 2017): the parties hold disjoint subsets of a timestamped
event table, secret-share per-time event/at-risk counts, form the secure
union, and run a secure logrank test comparing the two groups' survival
curves with one fixed-point division per time step.  An aggregated
variant first obliviously compacts the nonzero time steps per interval
(leaking only the per-interval event counts, as the aggregated curves
do anyway) and then spends one division per remaining candidate.

The resulting chi-squared statistic is verified against a cleartext
logrank computation (reference reports 6-digit agreement for aml,
docs/demos.rst:975-987).  Plots/lifelines are omitted (headless).

Usage: python demos/kmsurvival.py [-M m] [-i {0,2}] [-s S] [-a A] [--agg]
  datasets: 0=btrial (months), 2=aml (weeks)   [reference numbering]
"""
import argparse
import csv
import logging
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def chi2_sf_1df(x):
    """Survival function of chi-squared with 1 degree of freedom."""
    return math.erfc(math.sqrt(max(x, 0.0) / 2))


def events_to_table(maxT, T, E):
    """Survival table with one entry per time j = 1..maxT."""
    d = [0] * maxT
    n = [0] * maxT
    for t, e in zip(T, E):
        j = round(t)
        d[j-1] += e     # observed events at time j
        n[j-1] += 1-e   # censored events at time j
    N = sum(d) + sum(n)
    for j in range(maxT):
        n[j], N = N, N - (d[j] + n[j])
    return d, n


def plain_logrank(d1, d2, n1, n2):
    """Cleartext logrank chi-squared statistic."""
    detot = 0.0
    vtot = 0.0
    for dd1, dd2, nn1, nn2 in zip(d1, d2, n1, n2):
        d_j = dd1 + dd2
        n_j = nn1 + nn2
        if n_j < 2 or d_j == 0:
            continue
        e1 = d_j * nn1 / n_j
        detot += dd1 - e1
        vtot += e1 * (nn2 / n_j) * (n_j - d_j) / (n_j - 1)
    return detot**2 / vtot


def logrank_test(secfxp, d1, d2, n1, n2):
    """Secure logrank test, fully vectorized: ALL time steps ride one
    batched fixed-point division (cf. reference np_kmsurvival.py)."""
    D1 = mpc.np_fromlist(list(d1))
    D2 = mpc.np_fromlist(list(d2))
    N1 = mpc.np_fromlist(list(n1))
    N2 = mpc.np_fromlist(list(n2))
    d_j = D1 + D2
    n_j = N1 + N2
    b = n_j * (n_j - 1)
    c = d_j * N1 / (n_j * b)  # one batched division for all time steps
    detot = mpc.np_sum(D1 - b * c)
    vtot = mpc.np_sum(N2 * (n_j - d_j) * c)
    chi = mpc.run(mpc.output(detot**2 / vtot))
    return float(chi)


def aggregate(d, n, stride):
    agg_d = [mpc.sum(d[s:s + stride]) for s in range(0, len(d), stride)]
    return agg_d, n[::stride]


def agg_logrank_test(secfxp, d1, d2, n1, n2, agg_d1, agg_d2, stride):
    """Aggregated variant: oblivious compaction of active time steps."""
    candidates = []
    maxT = len(d1)
    for start in range(0, maxT, stride):
        group = start // stride
        n_observed = agg_d1[group] + agg_d2[group]
        msn = min(stride, n_observed)
        stop = min(start + stride, maxT)
        logging.info(f'Interval {group + 1} (time {start + 1} to {stop}) '
                     f'# observed events = {n_observed}')
        if msn == 0:
            continue

        table = [[secfxp(0), secfxp(0), secfxp(1), secfxp(1)]] * msn
        ix = [secfxp(0)] * msn
        for j in range(start, stop):
            is_active = d1[j] + d2[j] != 0
            ix = mpc.if_else(is_active, [1 - mpc.sum(ix)] + ix[:-1], ix)
            select = mpc.scalar_mul(is_active, ix)
            new = [d1[j], d2[j], n1[j], n2[j]]
            for i in range(msn):
                table[i] = mpc.if_else(select[i], new, table[i])
        candidates.extend(table)
    return logrank_test(secfxp, *zip(*candidates))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--dataset', type=int, metavar='I', default=0,
                        help='dataset 0=btrial (default), 2=aml')
    parser.add_argument('-s', '--stride', type=int, metavar='S', default=0)
    parser.add_argument('-a', '--accuracy', type=int, metavar='A', default=0)
    parser.add_argument('--agg', action='store_true',
                        help='also run the aggregated (compacted) variant')
    args, _ = parser.parse_known_args()

    settings = {0: ('btrial.csv', 12, 28, 'months', 'time', 'death', 'im', (1, 2)),
                2: ('aml.csv', 16, 32, 'weeks', 'time', 'cens', 'group', (1, 2))}
    name, stride, accuracy, unit, times, events, groups, (v1, v2) = \
        settings[args.dataset]
    if args.stride:
        stride = args.stride
    if args.accuracy:
        accuracy = args.accuracy

    path = os.path.join(os.path.dirname(__file__), 'data', 'surv', name)
    with open(path) as file:
        rows = list(csv.DictReader(file))
    T = [float(r[times]) for r in rows]
    E = [int(r[events]) for r in rows]
    G = [r[groups] for r in rows]

    mpc.run(mpc.start())
    m = len(mpc.parties)
    secfxp = mpc.SecFxp(2*accuracy, accuracy)
    print(f'Using secure fixed-point numbers: {secfxp.__name__}')
    print(f'dataset: {name}, with {len(rows)} individuals over '
          f'{m} parties ({unit})')

    # each party owns every m-th row (input_each keeps this plane-agnostic:
    # party j evaluates its own slice, also under --sim)
    def rows_of(pid):
        return [i for i in range(len(rows)) if i % m == pid]

    maxT = int(mpc.run(mpc.output(mpc.max(mpc.input_each(
        lambda j: mpc.SecInt(32)(max(round(T[i]) for i in rows_of(j))))))))

    def party_table(pid, value):
        idx = [i for i in rows_of(pid) if str(G[i]) == str(value)]
        return events_to_table(maxT, [T[i] for i in idx],
                               [E[i] for i in idx])

    # secure union: share per-time counts and add over parties
    def share_sum(col_fn):
        cols = mpc.input_each(
            lambda j: [secfxp(v) for v in col_fn(j)])
        return [mpc.sum(col) for col in zip(*cols)]

    d1 = share_sum(lambda j: party_table(j, v1)[0])
    n1 = share_sum(lambda j: party_table(j, v1)[1])
    d2 = share_sum(lambda j: party_table(j, v2)[0])
    n2 = share_sum(lambda j: party_table(j, v2)[1])

    chi = logrank_test(secfxp, d1, d2, n1, n2)
    p = chi2_sf_1df(chi)
    print(f'secure logrank: chi2 = {chi:.6f}, p = {p:.6f}')

    # cleartext verification on the full union
    dd1, nn1 = events_to_table(maxT, [T[i] for i in range(len(rows))
                                      if str(G[i]) == str(v1)],
                               [E[i] for i in range(len(rows))
                                if str(G[i]) == str(v1)])
    dd2, nn2 = events_to_table(maxT, [T[i] for i in range(len(rows))
                                      if str(G[i]) == str(v2)],
                               [E[i] for i in range(len(rows))
                                if str(G[i]) == str(v2)])
    chi_ref = plain_logrank(dd1, dd2, nn1, nn2)
    print(f'plain  logrank: chi2 = {chi_ref:.6f}, p = {chi2_sf_1df(chi_ref):.6f}')
    assert abs(chi - chi_ref) < 1e-3 * max(1, chi_ref), (chi, chi_ref)

    if args.agg:
        agg_d1, _ = aggregate(d1, n1, stride)
        agg_d2, _ = aggregate(d2, n2, stride)
        agg_d1 = [int(v) for v in mpc.run(mpc.output(agg_d1))]
        agg_d2 = [int(v) for v in mpc.run(mpc.output(agg_d2))]
        chi_a = agg_logrank_test(secfxp, d1, d2, n1, n2,
                                 agg_d1, agg_d2, stride)
        print(f'agg    logrank: chi2 = {chi_a:.6f}, p = {chi2_sf_1df(chi_a):.6f}')
        assert abs(chi_a - chi_ref) < 1e-3 * max(1, chi_ref), (chi_a, chi_ref)

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
