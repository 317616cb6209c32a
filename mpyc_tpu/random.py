"""Secure versions of random-module functions.

Parity target: /root/reference/mpyc/random.py — uniform secret values,
secret subsets/permutations, oblivious shuffles; rejection loops reveal only
accept/reject (as in the reference).
"""

import math

from mpyc_tpu import sectypes

runtime = None


def getrandbits(sectype, k, bits=False):
    """Uniformly random nonnegative k-bit integer (or its bits)."""
    draws = runtime.random_bits(sectype, k)
    return draws if bits else runtime.from_bits(draws)


def _randbelow(sectype, n, bits=False):
    """Uniformly random secret integer in range(n).

    Rejection sampling with BATCHED tests (a TPU-first delta from the
    reference's lazy per-bit loop, random.py:42-84): one draw of k bits,
    then every "x exceeds b at zero-bit position z" indicator is computed
    from log-depth partial products and opened in a single round.  An
    indicator fires iff the draw matches b on all higher one-bits and is 1
    at z, which happens iff x > b — so acceptance is exact and each
    attempt costs log k + 1 rounds.  Opened values reveal only (the
    position of) accept/reject, as in the reference.
    """
    if issubclass(sectype, sectypes.SecureFiniteField) and \
            n == sectype.field.order:
        assert not bits, 'bits not available'
        return runtime._random(sectype)

    b = n - 1
    k = b.bit_length()
    if not n & b:  # power of 2
        return getrandbits(sectype, k, bits=bits)
    t = (n & -n).bit_length() - 1   # low t bits of b are all ones
    ones = [i for i in range(k) if i >= t and (b >> i) & 1]
    zeros = [i for i in range(k) if i >= t and not (b >> i) & 1]
    while True:
        x = runtime.random_bits(sectype, k)
        # partial products of the one-bit draws, scanned from the top
        pp = {}
        acc = None
        for i in sorted(ones, reverse=True):
            acc = x[i] if acc is None else acc * x[i]
            pp[i] = acc
        tests = []
        for z in zeros:
            higher = [i for i in ones if i > z]
            h = pp[min(higher)] if higher else None
            tests.append(h * x[z] if h is not None else x[z])
        flags = runtime.run(runtime.output(tests))
        if not any(int(f) for f in flags):
            break
    if bits:
        return x
    return runtime.from_bits(x)


def random_unit_vector(sectype, n):
    """Uniformly random secret rotation of [1] + [0]*(n-1).

    Tensor-doubling construction: k secret bits select one of 2^k slots by
    repeatedly splitting the indicator vector into a (1-bit)- and a
    bit-weighted half (one batched multiplication round per bit).  When n
    is not a power of two, the single opened value sum(u[n:]) — the
    indicator that the slot index overflowed — decides accept/reject and
    the draw restarts.  A different construction from the reference's
    in-place grow-and-prune loop (random.py:87-118); leakage (one
    accept/reject bit per attempt) and round count are the same, local
    multiplication count is <= 2^ceil(log2 n) < 2n.
    """
    if n == 1:
        return [sectype(1)]
    k = (n - 1).bit_length()
    while True:
        x = runtime.random_bits(sectype, k)
        u = [sectype(1)]
        for x_i in x:
            hi = runtime.scalar_mul(x_i, u)
            u = runtime.vector_sub(u, hi) + hi
        if n == 1 << k:
            return u
        if not runtime.run(runtime.output(runtime.sum(u[n:]))):
            return u[:n]


def np_random_unit_vector(sectype, n):
    """Secure array variant of random_unit_vector."""
    u = random_unit_vector(sectype, n)
    return runtime.np_fromlist(u)


def randrange(sectype, start, stop=None, step=1):
    """Uniformly random secret integer in range(start, stop[, step])."""
    if stop is None:
        start, stop = 0, start
    span = range(start, stop, step)
    if not span:
        raise ValueError('empty range for randrange()')
    return _randbelow(sectype, len(span)) * step + start


def randint(sectype, a, b):
    """Uniformly random secret integer in [a..b]."""
    return randrange(sectype, a, b + 1)


def choice(sectype, seq):
    """Uniformly random secret element chosen from seq."""
    if not seq:
        raise IndexError('cannot choose from an empty sequence')
    sel = random_unit_vector(sectype, len(seq))
    return sum((s * v for s, v in zip(sel, seq)), start=0)


def choices(sectype, population, weights=None, *, cum_weights=None, k=1):
    """k uniformly (or weighted) random secret elements with replacement."""
    if cum_weights is None:
        if weights is None:
            return [choice(sectype, population) for _ in range(k)]
        cum_weights = list(weights)
        for i in range(1, len(cum_weights)):
            cum_weights[i] += cum_weights[i - 1]
    elif weights is not None:
        raise TypeError('cannot specify both weights and cumulative weights')
    if len(cum_weights) != len(population):
        raise ValueError('number of weights does not match the population')
    n = cum_weights[-1]
    out = []
    for _ in range(k):
        r = _randbelow(sectype, n)
        # select first index with r < cum_weights[i]
        s = 0
        prev = 0
        sel = None
        for i, cw in enumerate(cum_weights):
            hit = runtime.sgn(r - cw, LT=True) - (
                runtime.sgn(r - prev, LT=True) if prev else 0)
            term = hit * population[i]
            sel = term if sel is None else sel + term
            prev = cw
        out.append(sel)
    return out


def shuffle(sectype, x):
    """Secretly shuffle list x in place.

    Downward oblivious Fisher-Yates: for i = n-1 .. 1, a secret unit
    vector picks a uniform slot j <= i, slot i receives x[j], and the
    displaced x[i] lands in slot j — both effected by adding the rank-1
    update sel * (x[i] - x[j]) to the prefix.  Elements may be numbers or
    equal-length lists of numbers (rows swap as wholes), as in the
    reference (random.py:225-258); the iteration direction and the
    prefix-update formulation are this implementation's own.
    """
    n = len(x)
    rows = isinstance(x[0], list)
    coerce = (lambda v: [vi if isinstance(vi, sectype) else sectype(vi)
                         for vi in v]) if rows else \
        (lambda v: v if isinstance(v, sectype) else sectype(v))
    for i in range(n):
        x[i] = coerce(x[i])
    for i in range(n - 1, 0, -1):
        sel = random_unit_vector(sectype, i + 1)
        if rows:
            chosen = runtime.matrix_prod([sel], x[:i + 1])[0]
            delta = runtime.matrix_prod(
                [[s] for s in sel], [runtime.vector_sub(x[i], chosen)])
            x[:i + 1] = runtime.matrix_add(x[:i + 1], delta)
        else:
            chosen = runtime.in_prod(x[:i + 1], sel)
            delta = runtime.scalar_mul(x[i] - chosen, sel)
            x[:i + 1] = runtime.vector_add(x[:i + 1], delta)
        x[i] = chosen


def random_permutation(sectype, x):
    """Uniformly random secret permutation of x (or of range(x))."""
    if isinstance(x, int):
        x = list(range(x))
    x = list(x)
    shuffle(sectype, x)
    return x


def random_derangement(sectype, x):
    """Uniformly random secret derangement of x (or of range(x))."""
    if isinstance(x, int):
        x = list(range(x))
    x = list(x)
    t = sectype(0)
    while True:
        y = random_permutation(sectype, x)
        t = runtime.prod([y[i] - x[i] if isinstance(x[i], sectype)
                          else y[i] - x[i] for i in range(len(x))])
        if not runtime.is_zero_public(t):
            return y


def sample(sectype, population, k):
    """k uniformly random secret elements without replacement."""
    n = len(population)
    if not 0 <= k <= n:
        raise ValueError('sample larger than population or negative')
    if isinstance(population, range):
        # rejection sampling of distinct randrange draws: fast and
        # space-efficient for large ranges (reference random.py:314-323)
        x = []
        while len(x) < k:
            r = randrange(sectype, population.start, population.stop,
                          population.step)
            if x:
                t = runtime.prod([r - a for a in x])
                if runtime.run(runtime.is_zero_public(t)):
                    continue
            x.append(r)
        return x
    x = list(population)
    for i in range(min(k, n - 1)):
        u = random_unit_vector(sectype, n - i)
        x_u = runtime.in_prod([xi if isinstance(xi, sectype)
                               else sectype(xi) for xi in x[i:]], u)
        d = runtime.scalar_mul((x[i] if isinstance(x[i], sectype)
                                else sectype(x[i])) - x_u, u)
        x[i] = x_u
        tail = [xi if isinstance(xi, sectype) else sectype(xi)
                for xi in x[i:]]
        x[i:] = runtime.vector_add(tail, d)
    return x[:k]


def _frac_bits(sectype):
    f = sectype.frac_length
    if not f:
        raise TypeError('secure fixed-point type required')
    return f


def random(sectype):
    """Uniformly random secret fixed-point number in [0.0, 1.0)."""
    f = _frac_bits(sectype)
    return getrandbits(sectype, f) * (2 ** -f)


def uniform(sectype, a, b):
    """Uniformly random secret fixed-point number N with a <= N <= b
    (or b <= N <= a)."""
    f = _frac_bits(sectype)
    lo, hi = sorted((a, b))
    steps = round((hi - lo) * (1 << f))
    return _randbelow(sectype, steps + 1) * (2 ** -f) + lo
