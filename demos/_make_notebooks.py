#!/usr/bin/env python
"""Generate the demo notebooks (counterparts of the reference's 6 .ipynb).

Each notebook is built from (markdown, code) cell pairs defined below and
written as nbformat-4 JSON.  Run from demos/:  python _make_notebooks.py
"""
import json
import sys


def nb(cells):
    out = {
        'cells': [],
        'metadata': {
            'kernelspec': {'display_name': 'Python 3', 'language': 'python',
                           'name': 'python3'},
            'language_info': {'name': 'python', 'version': '3.11'},
        },
        'nbformat': 4,
        'nbformat_minor': 5,
    }
    for kind, src in cells:
        cell = {'cell_type': kind, 'metadata': {},
                'source': src.splitlines(keepends=True)}
        if kind == 'code':
            cell.update(execution_count=None, outputs=[])
        out['cells'].append(cell)
    return out


SETUP = """\
import os, sys
sys.path.insert(0, os.path.abspath('..'))
from mpyc_tpu.runtime import mpc
mpc.run(mpc.start())  # required only when run with multiple parties"""

NOTEBOOKS = {}

NOTEBOOKS['4demos'] = [
    ('markdown', """\
# Four Demos

A quick tour of mpyc_tpu, the TPU-native multiparty computation framework,
through four small demos: helloworld, oneliners-style expressions,
parallel sorting, and Secret Santa.  Run this notebook stand-alone
(single party) or with multiple parties via the demo scripts."""),
    ('code', SETUP),
    ('markdown', """\
## 1. Hello world

Every party secret-shares an input; the sum is computed on shares and
only the result is opened."""),
    ('code', """\
secint = mpc.SecInt()
my_age = 21 + mpc.pid  # stand-in for a private input
ages = mpc.input(secint(my_age))  # one share-vector per party
total = mpc.sum(ages)
print('sum of all ages:', mpc.run(mpc.output(total)))"""),
    ('markdown', """\
## 2. Secure one-liners

Operator overloading lets ordinary Python expressions run as multiparty
protocols.  Comparisons, max, bit ops — all on secret values."""),
    ('code', """\
a, b, c = secint(13), secint(7), secint(21)
print(mpc.run(mpc.output(a * b + c)))
print(mpc.run(mpc.output(a < b)))
print(mpc.run(mpc.output(mpc.max(a, b, c))))
print(mpc.run(mpc.output((a - b) % 5)))"""),
    ('markdown', """\
## 3. Parallel sort

Batcher merge-exchange sorting on secret values: data-independent
compare-and-swap network, so nothing about the order leaks."""),
    ('code', """\
secfxp = mpc.SecFxp()
xs = [secfxp(v) for v in [2.75, -0.5, 3.125, 1.0, -2.0]]
ys = mpc.sorted(xs)
print([float(v) for v in mpc.run(mpc.output(ys))])"""),
    ('markdown', """\
## 4. Secret Santa

A uniformly random derangement (nobody draws themselves), computed
jointly; see SecretSantaExplained for the construction."""),
    ('code', """\
from mpyc_tpu import random as mrandom
der = mrandom.random_derangement(secint, 5)
print([int(v) for v in mpc.run(mpc.output(der))])"""),
    ('code', 'mpc.run(mpc.shutdown())'),
]

NOTEBOOKS['SecretSantaExplained'] = [
    ('markdown', """\
# Secret Santa Explained

How to draw a uniformly random secret *derangement* — a permutation
p with p(i) != i for all i — so nobody draws their own name and nobody
learns more than their own assignment.  Built in three layers:
random unit vectors, oblivious Fisher-Yates, and rejection sampling.
See demos/SecretSantaExplained.py for the script version."""),
    ('code', SETUP),
    ('code', 'secint = mpc.SecInt()'),
    ('markdown', """\
## Stage 1: secret random unit vector

A secret `[0,...,0,1,0,...,0]` with the 1 in a uniformly random spot.
Each secret random bit doubles the length of the vector: `u -> [u*(1-b),
u*b]`; odd lengths use one public rejection event (probability 1/2m)."""),
    ('code', """\
def random_unit_vector(n):
    if n == 1:
        return [secint(1)]
    b = mpc.random_bit(secint)
    x = random_unit_vector((n + 1) // 2)
    z = mpc.scalar_mul(b, x)
    if n % 2 == 0:
        return z + mpc.vector_sub(x, z)
    if mpc.run(mpc.output(z[0])):  # reject: b=1 and x[0]=1
        return random_unit_vector(n)
    return z[1:] + mpc.vector_sub(x, z)

print([int(mpc.run(mpc.output(v))) for v in random_unit_vector(7)])"""),
    ('markdown', """\
## Stage 2: secret random permutation (oblivious Fisher-Yates)

Position i swaps with a random position >= i selected by a unit vector;
each swap is one inner product plus one scalar multiplication — a
constant number of communication rounds per position."""),
    ('code', """\
def random_permutation(n):
    x = [secint(i) for i in range(n)]
    for i in range(n - 1):
        u = random_unit_vector(n - i)
        x_u = mpc.in_prod(x[i:], u)
        d = mpc.scalar_mul(x[i] - x_u, u)
        x[i] = x_u
        for j in range(n - i):
            x[i + j] = x[i + j] + d[j]
    return x

print([int(mpc.run(mpc.output(v))) for v in random_permutation(7)])"""),
    ('markdown', """\
## Stage 3: derangement by rejection

`t = prod(p(i) - i)` is zero iff p has a fixed point.  Opening only the
*zero-ness* of t (one public zero test) reveals exactly the rejection
event; conditioned on acceptance the result is uniform over
derangements.  Expected number of trials tends to e = 2.718..."""),
    ('code', """\
def random_derangement(n):
    while True:
        p = random_permutation(n)
        t = mpc.prod([p[i] - i for i in range(n)])
        if not mpc.run(mpc.is_zero_public(t)):
            return p

p = [int(mpc.run(mpc.output(v))) for v in random_derangement(7)]
assert all(v != i for i, v in enumerate(p))
print(p)"""),
    ('code', 'mpc.run(mpc.shutdown())'),
]

NOTEBOOKS['PrefixOrExplained'] = [
    ('markdown', """\
# Ways to Do Prefix-Or: `mpctools.accumulate()` Explained

Computing all prefixes `x0, x0|x1, x0|x1|x2, ...` of secret bits is a
staple of secure comparison and bit-decomposition protocols.  The
dominant cost is ROUND complexity (depth in sequential secure
multiplications); secondary is WORK (total multiplications).  This
notebook walks the trade-off: chain (depth n-1), Sklansky (depth log n,
work (n/2) log n), Brent-Kung (depth ~2 log n, work ~2n).
See demos/PrefixOrExplained.py for the instrumented script version."""),
    ('code', SETUP),
    ('code', """\
import itertools
secint = mpc.SecInt()

def or2(a, b):          # one secure multiplication
    return a + b - a * b

def check(prefix_fn, n=8):
    for bits in itertools.product([0, 1], repeat=n):
        y = prefix_fn([secint(b) for b in bits])
        got = [int(mpc.run(mpc.output(v))) for v in y]
        assert got == list(itertools.accumulate(bits, lambda a, b: a | b))
    print('correct on all', 2**n, 'inputs')"""),
    ('markdown', """\
## 1. The chain — depth n-1

`itertools.accumulate` is correct but its n-1 multiplications are
sequential: n-1 communication rounds."""),
    ('code', """\
check(lambda x: list(itertools.accumulate(x, or2)))"""),
    ('markdown', """\
## 2. Sklansky — minimal depth log2 n

Divide and conquer: solve both halves, then or the last prefix of the
left half into every prefix of the right half.  All combine gates of a
level run in the same round."""),
    ('code', """\
def sklansky(x):
    n = len(x)
    if n == 1:
        return list(x)
    h = (n + 1) // 2
    left, right = sklansky(x[:h]), sklansky(x[h:])
    return left + [or2(left[-1], v) for v in right]

check(sklansky)"""),
    ('markdown', """\
## 3. Brent-Kung — linear work ~2n

Halve by or-ing adjacent pairs, recurse, then fix up odd positions:
work W(n) = W(n/2) + n - 1 is about 2n, with depth about 2 log2 n."""),
    ('code', """\
def brent_kung(x):
    n = len(x)
    if n == 1:
        return list(x)
    inner = brent_kung([or2(x[i], x[i+1]) for i in range(0, n - 1, 2)])
    y = [x[0]]
    for i in range(1, n):
        y.append(inner[i//2] if i % 2 else or2(inner[i//2 - 1], x[i]))
    return y

check(brent_kung)"""),
    ('markdown', """\
## 4. The production version

`mpctools.accumulate(x, f)` implements both networks for ANY associative
f (carry propagation, matrix products, group ops, ...) and picks one by
a cost heuristic.  O(1)-depth tricks exist for prefix-or specifically,
but not for arbitrary associative f — log-depth networks are the right
general building block."""),
    ('code', """\
from mpyc_tpu import mpctools
check(lambda x: list(mpctools.accumulate(x, or2)))"""),
    ('code', 'mpc.run(mpc.shutdown())'),
]

NOTEBOOKS['OneWayHashChainsExplained'] = [
    ('markdown', """\
# One-Way Hash Chains Explained

A hash chain x0, f(x0), ..., f^(n-1)(x0) generated under MPC and
revealed in REVERSE order: each revealed element authenticates the next
(Lamport one-time signatures / TESLA-style), and upcoming elements stay
secret because nobody knows the seed.  The cost question: how many
evaluations of f per output round, storing how many states?
Jakobsson's optimal binary pebbling needs only k/2 hashes per round and
k stored states for a chain of length 2^k.
See demos/onewayhashchains.py and demos/np_onewayhashchains.py."""),
    ('code', SETUP),
    ('markdown', """\
## The one-way function

Matyas-Meyer-Oseas from threshold AES: f(x) = AES_K(x) + x on secure
GF(2^8) states, with a fixed public-derived key schedule.  (The script
version also offers SHAKE128 on secret bits via --sha3.)"""),
    ('code', """\
import aes
secfld = aes.secfld
K = aes.key_expansion(mpc.np_fromlist([secfld(3)]*16).reshape(4, 4))
f = lambda x: aes.encrypt(K, x) + x"""),
    ('markdown', """\
## Forward generation, reverse disclosure

Naive reversal either stores all 2^k states (memory) or recomputes from
the seed each round (k 2^k hashes).  Binary pebbling places k pebbles at
power-of-two distances and moves them just-in-time."""),
    ('code', """\
import np_onewayhashchains as owhc
owhc.f = f
k = 2
xs = []
x0 = mpc.np_fromlist([secfld(1)]*16).reshape(4, 4)
for v in owhc.p(k, x0):   # iterative optimal pebbler
    if v is not None:
        out = mpc.run(mpc.output(v, raw=True)).value
        xs.append(bytes(int(b) for b in out.T.reshape(-1)).hex())
for i, h in enumerate(xs):
    print(f'x{len(xs)-1-i} =', h)"""),
    ('markdown', """\
## Verifying the chain property

Each revealed element hashes to the previously revealed one — that is
the whole point: possession of x_i proves knowledge of the chain up to
x_{i-1} revealed earlier."""),
    ('code', """\
st = lambda h: secfld.array(aes.to_state(list(bytes.fromhex(h)))) \\
    if hasattr(aes, 'to_state') else None
# recompute f on the opened x1 and compare with x0 revealed before it
x1 = mpc.input(secfld.array(
    __import__('numpy').array(list(bytes.fromhex(xs[-2])), dtype=object)
    .reshape(4, 4).T), senders=0)
y = f(x1)
out = mpc.run(mpc.output(y, raw=True)).value
print('f(x1) =', bytes(int(b) for b in out.T.reshape(-1)).hex())
print('x0    =', xs[-1])"""),
    ('code', 'mpc.run(mpc.shutdown())'),
]

NOTEBOOKS['KaplanMeierSurvivalExplained'] = [
    ('markdown', """\
# Kaplan-Meier Survival Analysis Explained

Two hospitals hold disjoint patient cohorts (time-to-event data with
censoring) and want the logrank test comparing two treatment groups —
without pooling raw data.  Each party secret-shares its per-time event
and at-risk counts; the union is a secure elementwise sum; the logrank
statistic needs one secure fixed-point division per time step, batched
into a single array division here.
See demos/kmsurvival.py for the full demo with real datasets."""),
    ('code', SETUP),
    ('markdown', """\
## Toy cohort, secret-shared

d1/n1 and d2/n2: events and numbers at risk per time step for the two
groups, split across the parties (here: one party holds everything)."""),
    ('code', """\
import numpy as np
secfxp = mpc.SecFxp(64)
d1 = np.array([1, 0, 2, 0, 1]); n1 = np.array([10, 9, 9, 7, 7])
d2 = np.array([2, 1, 0, 1, 0]); n2 = np.array([10, 8, 7, 7, 6])
sd1 = mpc.input(secfxp.array(d1 * 1.0), senders=0)
sn1 = mpc.input(secfxp.array(n1 * 1.0), senders=0)
sd2 = mpc.input(secfxp.array(d2 * 1.0), senders=0)
sn2 = mpc.input(secfxp.array(n2 * 1.0), senders=0)"""),
    ('markdown', """\
## The logrank statistic, batched

Per time j: expected events in group 2 under H0 are
`e2 = d * n2 / n` with d = d1+d2, n = n1+n2; the variance term is
`v = d*(n1/n)*(n2/n)*(n-d)/(n-1)`.  All divisions are ONE batched
secure fixed-point array division — the round count is independent of
the number of time steps."""),
    ('code', """\
d = sd1 + sd2
n = sn1 + sn2
inv_n = 1 / n                      # one batched secure reciprocal
e2 = d * sn2 * inv_n
v = d * (sn1 * inv_n) * (sn2 * inv_n) * (n - d) / (n - 1)
o_minus_e = mpc.np_sum(sd2 - e2)
var = mpc.np_sum(v)
chi2 = o_minus_e * o_minus_e / var
print('logrank chi-squared:', float(mpc.run(mpc.output(chi2))))"""),
    ('markdown', """\
## Checking against the cleartext computation

With public toy data we can verify the secure result directly (the
kmsurvival.py demo does the same against real datasets, matching to ~6
digits)."""),
    ('code', """\
dd = d1 + d2; nn = n1 + n2
e2p = dd * n2 / nn
vp = dd * (n1 / nn) * (n2 / nn) * (nn - dd) / (nn - 1)
chi2p = (d2 - e2p).sum()**2 / vp.sum()
print('cleartext chi-squared:', chi2p)"""),
    ('code', 'mpc.run(mpc.shutdown())'),
]

NOTEBOOKS['SecureSortingNetsExplained'] = [
    ('markdown', """\
# Secure Sorting Networks Explained

Sorting secret values cannot branch on comparisons — the pattern of
moves would leak the order.  Sorting NETWORKS apply a fixed,
data-independent sequence of compare-and-swap gates, so they port
directly to MPC: each gate becomes `if_swap(a > b, a, b)`, one secure
comparison plus one linear update.
See mpc.sorted() / np_sort for the production Batcher merge-exchange."""),
    ('code', SETUP),
    ('code', """\
secint = mpc.SecInt()

def cswap(x, i, j):
    x[i], x[j] = mpc.if_swap(x[i] > x[j], x[j], x[i])"""),
    ('markdown', """\
## Odd-even transposition — the bubble sort of networks

n rounds of alternating neighbor gates: simple, depth n, n(n-1)/2
gates."""),
    ('code', """\
def odd_even_transposition(x):
    n = len(x)
    for r in range(n):
        for i in range(r % 2, n - 1, 2):
            cswap(x, i, i + 1)
    return x

x = [secint(v) for v in [5, 1, 4, 1, 5, 9, 2, 6]]
print([int(v) for v in mpc.run(mpc.output(odd_even_transposition(x)))])"""),
    ('markdown', """\
## Batcher merge-exchange — depth O(log^2 n)

Batcher's networks sort in ~(log2 n)(log2 n + 1)/2 rounds of parallel
gates; all gates of a round share one batched comparison, so the round
complexity, not the gate count, is what MPC pays for."""),
    ('code', """\
def batcher(x):
    n = len(x)
    t = (n - 1).bit_length()
    p = 1 << (t - 1)
    while p:
        d, q, r = p, 1 << (t - 1), 0
        while d:
            for i in range(n - d):
                if i & p == r:
                    cswap(x, i, i + d)
            d, q, r = q - p, q >> 1, p
        p >>= 1
    return x

x = [secint(v) for v in [5, 1, 4, 1, 5, 9, 2, 6]]
print([int(v) for v in mpc.run(mpc.output(batcher(x)))])"""),
    ('markdown', """\
## The production path

`mpc.sorted(x)` (lists) and `a.sort()` / `mpc.np_sort(a)` (secure
arrays) run the same Batcher network with each round's gates batched
into ONE vectorized secure comparison — on TPU the whole round is a
single fused kernel + one exchange."""),
    ('code', """\
import numpy as np
a = secint.array(np.array([5, 1, 4, 1, 5, 9, 2, 6], dtype=object))
print(mpc.run(mpc.output(mpc.np_sort(a))).tolist())"""),
    ('code', 'mpc.run(mpc.shutdown())'),
]


def main():
    names = sys.argv[1:] or list(NOTEBOOKS)
    for name in names:
        path = f'{name}.ipynb'
        with open(path, 'w') as fh:
            json.dump(nb(NOTEBOOKS[name]), fh, indent=1)
        print('wrote', path)


if __name__ == '__main__':
    main()
