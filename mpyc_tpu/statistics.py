"""Secure versions of statistics-module functions.

Parity target: /root/reference/mpyc/statistics.py — mean/variance/stdev,
median/quantiles, mode, covariance/correlation/linear_regression over secure
integers and fixed-point numbers. Secure square roots via the bitwise
algorithm (one comparison per output bit, statistics.py:180-213).
"""

from mpyc_tpu import sectypes

runtime = None


def _check(data):
    data = list(data)
    if not data:
        raise ValueError('data must not be empty')
    return data


def mean(data):
    """Secure mean, rounded to nearest (reference statistics.py:34-64)."""
    data = _check(data)
    n = len(data)
    stype = type(data[0])
    if issubclass(stype, sectypes.SecureFixedPoint):
        s = runtime.sum(data)
        e = n.bit_length() - 1  # 1/2 < 2**e / n <= 1
        return s * (2 ** e / n) * 2 ** -e
    if issubclass(stype, sectypes.SecureInteger):
        s = runtime.sum(data)
        return (s + n // 2) // n  # round to nearest integer
    raise TypeError('secure fixed-point or integer type required')


def variance(data, xbar=None):
    """Secure sample variance of data."""
    return _var(_check(data), xbar, 1)


def stdev(data, xbar=None):
    """Secure sample standard deviation of data."""
    return _std(_check(data), xbar, 1)


def pvariance(data, mu=None):
    """Secure population variance of data."""
    return _var(_check(data), mu, 0)


def pstdev(data, mu=None):
    """Secure population standard deviation of data."""
    return _std(_check(data), mu, 0)


def _var(data, m, correction):
    n = len(data)
    if n < 1 + correction:
        raise ValueError('variance requires at least '
                         f'{1 + correction} data points')
    stype = type(data[0])
    if m is None:
        m = mean(data)
    d = [x - m for x in data]
    s = runtime.in_prod(d, d)
    if issubclass(stype, sectypes.SecureFixedPoint):
        return s / (n - correction)
    return s // (n - correction)


def _std(data, m, correction):
    stype = type(data[0])
    v = _var(data, m, correction)
    if issubclass(stype, sectypes.SecureFixedPoint):
        return _fsqrt(v)
    return _isqrt(v)


def _isqrt(a):
    """Secure integer square root of nonnegative a (bitwise algorithm)."""
    sectype = type(a)
    e = (sectype.bit_length - 1) // 2
    r, r2 = sectype(0), sectype(0)
    j = 1 << e
    for _ in range(e + 1):
        h, h2 = r + j, r2 + (2 * r + j) * j
        r, r2 = runtime.if_else(h2 <= a, [h, h2], [r, r2])
        j >>= 1
    return r


def _fsqrt(a):
    """Secure square root of nonnegative fixed-point a (bitwise algorithm)."""
    sectype = type(a)
    f = sectype.frac_length
    e = (sectype.bit_length + f - 1) // 2
    r = sectype(0)
    j = 2 ** (e - f)
    for _ in range(e + 1):
        h = r + j
        r = runtime.if_else(h * h <= a, h, r)
        j /= 2
    return r


def median(data):
    """Secure median of data (mean of middle two for even n)."""
    return _med(_check(data))


def median_low(data):
    """Secure low median of data."""
    return _med(_check(data), med='low')


def median_high(data):
    """Secure high median of data."""
    return _med(_check(data), med='high')


def _med(data, med=None):
    n = len(data)
    s = runtime.sorted(data)
    if n % 2:
        return s[n // 2]
    if med == 'low':
        return s[n // 2 - 1]
    if med == 'high':
        return s[n // 2]
    stype = type(data[0])
    two = s[n // 2 - 1] + s[n // 2]
    if issubclass(stype, sectypes.SecureFixedPoint):
        return two / 2
    return two // 2


def quantiles(data, *, n=4, method='exclusive'):
    """Secure quantiles: cut points dividing data into n equal intervals."""
    data = _check(data)
    ld = len(data)
    if ld < 2:
        raise ValueError('must have at least two data points')
    stype = type(data[0])
    is_fxp = issubclass(stype, sectypes.SecureFixedPoint)
    x = runtime.sorted(data)
    result = []
    if method == 'inclusive':
        m = ld - 1
        for i in range(1, n):
            j, delta = divmod(i * m, n)
            interp = x[j] * (n - delta) + x[j + 1] * delta
            result.append(interp / n if is_fxp else interp // n)
        return result
    if method == 'exclusive':
        m = ld + 1
        for i in range(1, n):
            j = i * m // n
            j = 1 if j < 1 else (ld - 1 if j > ld - 1 else j)
            delta = i * m - j * n
            interp = x[j - 1] * (n - delta) + x[j] * delta
            result.append(interp / n if is_fxp else interp // n)
        return result
    raise ValueError(f'unknown method: {method!r}')


def mode(data):
    """Secure mode: the most common data point (ties: smallest value wins)."""
    data = _check(data)
    n = len(data)
    # count matrix via pairwise equality (n^2/2 secure equality tests)
    counts = []
    for i in range(n):
        c = None
        for j in range(n):
            e = runtime.eq(data[i], data[j]) if i != j else None
            if e is not None:
                c = e if c is None else c + e
        counts.append(c if c is not None else data[0] - data[0])
    # tournament over (count, value) pairs, preferring higher count
    best_c, best_v = counts[0], data[0]
    for i in range(1, n):
        swap = best_c < counts[i]
        best_c = runtime.if_else(swap, counts[i], best_c)
        best_v = runtime.if_else(swap, data[i], best_v)
    return best_v


def covariance(x, y):
    """Secure sample covariance of x and y."""
    x, y = _check(x), _check(y)
    n = len(x)
    if len(y) != n:
        raise ValueError('covariance requires that both inputs have same '
                         'number of data points')
    if n < 2:
        raise ValueError('covariance requires at least two data points')
    stype = type(x[0])
    xbar = mean(x)
    ybar = mean(y)
    d = runtime.in_prod([a - xbar for a in x], [b - ybar for b in y])
    if issubclass(stype, sectypes.SecureFixedPoint):
        return d / (n - 1)
    return d // (n - 1)


def correlation(x, y):
    """Secure Pearson correlation coefficient of x and y (fxp only)."""
    x, y = _check(x), _check(y)
    n = len(x)
    if len(y) != n:
        raise ValueError('correlation requires that both inputs have same '
                         'number of data points')
    if n < 2:
        raise ValueError('correlation requires at least two data points')
    stype = type(x[0])
    if not issubclass(stype, sectypes.SecureFixedPoint):
        raise TypeError('secure fixed-point type required')
    xbar = mean(x)
    ybar = mean(y)
    dx = [a - xbar for a in x]
    dy = [b - ybar for b in y]
    sxy = runtime.in_prod(dx, dy)
    sxx = runtime.in_prod(dx, dx)
    syy = runtime.in_prod(dy, dy)
    return sxy / (_fsqrt(sxx) * _fsqrt(syy))


def linear_regression(x, y):
    """Secure slope and intercept of the least-squares line (fxp only)."""
    x, y = _check(x), _check(y)
    n = len(x)
    if len(y) != n:
        raise ValueError('linear regression requires that both inputs have '
                         'same number of data points')
    if n < 2:
        raise ValueError('linear regression requires at least two data '
                         'points')
    stype = type(x[0])
    if not issubclass(stype, sectypes.SecureFixedPoint):
        raise TypeError('secure fixed-point type required')
    xbar = mean(x)
    ybar = mean(y)
    dx = [a - xbar for a in x]
    sxy = runtime.in_prod(dx, [b - ybar for b in y])
    sxx = runtime.in_prod(dx, dx)
    slope = sxy / sxx
    intercept = ybar - slope * xbar
    import collections
    LinReg = collections.namedtuple('LinearRegression',
                                    ('slope', 'intercept'))
    return LinReg(slope, intercept)
