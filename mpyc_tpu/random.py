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
    x = runtime.random_bits(sectype, k)
    if bits:
        return x
    return runtime.from_bits(x)


def _randbelow(sectype, n, bits=False):
    """Uniformly random secret integer in range(n) (reference random.py:45)."""
    if issubclass(sectype, sectypes.SecureFiniteField) and \
            n == sectype.field.order:
        assert not bits, 'bits not available'
        return runtime._random(sectype)

    b = n - 1
    k = b.bit_length()
    if not n & b:  # power of 2
        return getrandbits(sectype, k, bits=bits)
    x = runtime.random_bits(sectype, k)
    h = 1
    i = k
    t = (n & -n).bit_length()
    while i >= t:
        i -= 1
        if (b >> i) & 1:
            h = h * x[i] if not isinstance(h, int) else x[i]
        elif runtime.run(runtime.output(
                x[i] if isinstance(h, int) else h * x[i])):
            # reject: redraw the unused low bits
            x[i:] = runtime.random_bits(sectype, k - i)
            h = 1
            i = k
    if bits:
        return x
    return runtime.from_bits(x)


def random_unit_vector(sectype, n):
    """Uniformly random secret rotation of [1] + [0]*(n-1)."""
    if n == 1:
        return [sectype(1)]
    b = n - 1
    k = b.bit_length()
    x = runtime.random_bits(sectype, k)
    i = k - 1
    u = [x[i], 1 - x[i]]
    while i:
        i -= 1
        v = runtime.scalar_mul(x[i], u)
        if (b >> i) & 1:
            v.extend(runtime.vector_sub(u, v))
            u = v
        elif runtime.run(runtime.output(v[0])):
            # restart, keeping unused secret random bits x[:i]
            x[i:] = runtime.random_bits(sectype, k - i)
            i = k - 1
            u = [x[i], 1 - x[i]]
        else:
            v = v[1:]
            v.extend(runtime.vector_sub(u[1:], v))
            u[1:] = v
    return u


def np_random_unit_vector(sectype, n):
    """Secure array variant of random_unit_vector."""
    u = random_unit_vector(sectype, n)
    return runtime.np_fromlist(u)


def randrange(sectype, start, stop=None, step=1):
    """Uniformly random secret integer in range(start, stop[, step])."""
    if stop is None:
        stop = start
        start = 0
    n = len(range(start, stop, step))
    if not n:
        raise ValueError('empty range for randrange()')
    return _randbelow(sectype, n) * step + start


def randint(sectype, a, b):
    """Uniformly random secret integer in [a..b]."""
    return randrange(sectype, a, b + 1)


def choice(sectype, seq):
    """Uniformly random secret element chosen from seq."""
    if not seq:
        raise IndexError('cannot choose from an empty sequence')
    u = random_unit_vector(sectype, len(seq))
    s = 0
    for i, x_i in enumerate(seq):
        s = s + u[i] * x_i
    return s


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
    """Secretly shuffle list x in place (reference random.py:225)."""
    n = len(x)
    x_i_is_list = isinstance(x[0], list)
    if not x_i_is_list:
        for i in range(n):
            if not isinstance(x[i], sectype):
                x[i] = sectype(x[i])
        for i in range(n - 1):
            u = random_unit_vector(sectype, n - i)
            x_u = runtime.in_prod(x[i:], u)
            d = runtime.scalar_mul(x[i] - x_u, u)
            x[i] = x_u
            x[i:] = runtime.vector_add(x[i:], d)
        return

    for j in range(len(x[0])):
        for i in range(n):
            if not isinstance(x[i][j], sectype):
                x[i][j] = sectype(x[i][j])
    for i in range(n - 1):
        u = random_unit_vector(sectype, n - i)
        x_u = runtime.matrix_prod([u], x[i:])[0]
        d = runtime.matrix_prod([[a] for a in u],
                                [runtime.vector_sub(x[i], x_u)])
        x[i] = x_u
        x[i:] = runtime.matrix_add(x[i:], d)


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


def random(sectype):
    """Uniformly random secret fixed-point number in [0.0, 1.0)."""
    f = sectype.frac_length
    if not f:
        raise TypeError('secure fixed-point type required')
    x = runtime.random_bits(sectype, f)
    return runtime.from_bits(x) * (2 ** -f)


def uniform(sectype, a, b):
    """Uniformly random secret fixed-point number N with a <= N <= b
    (or b <= N <= a)."""
    f = sectype.frac_length
    if not f:
        raise TypeError('secure fixed-point type required')
    lo, hi = (a, b) if a <= b else (b, a)
    n = round((hi - lo) * (1 << f))
    return _randbelow(sectype, n + 1) * (2 ** -f) + lo
