"""Secure versions of statistics-module functions.

Parity target: /root/reference/mpyc/statistics.py — mean/variance/stdev,
median/quantiles, mode, covariance/correlation/linear_regression over secure
integers and fixed-point numbers. Secure square roots via the bitwise
algorithm (one comparison per output bit, statistics.py:180-213).
"""

import statistics as _stats

from mpyc_tpu import sectypes

runtime = None


def _check(data, min_n=1, what='data'):
    data = list(data)
    if len(data) < min_n:
        raise _stats.StatisticsError(
            f'{what} requires at least {min_n} data point(s)')
    return data


def mean(data):
    """Secure mean, rounded to nearest (reference statistics.py:34-64).

    Plain (non-secure) data delegates to the statistics module."""
    data = _check(data, 1, 'mean')
    n = len(data)
    stype = type(data[0])
    if not issubclass(stype, sectypes.SecureObject):
        return _stats.mean(data)
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
    return _var(_check(data, 2, 'variance'), xbar, 1)


def stdev(data, xbar=None):
    """Secure sample standard deviation of data."""
    return _std(_check(data, 2, 'stdev'), xbar, 1)


def pvariance(data, mu=None):
    """Secure population variance of data."""
    return _var(_check(data, 1, 'pvariance'), mu, 0)


def pstdev(data, mu=None):
    """Secure population standard deviation of data."""
    return _std(_check(data, 1, 'pstdev'), mu, 0)


def _var(data, m, correction):
    n = len(data)
    stype = type(data[0])
    if not issubclass(stype, sectypes.SecureObject):
        if correction:
            return _stats.variance(data, m)
        return _stats.pvariance(data, m)
    if issubclass(stype, sectypes.SecureFixedPoint):
        if m is None:
            m = mean(data)
        y = runtime.vector_sub(data, [m] * n)
        return runtime.in_prod(y, y) / (n - correction)
    if issubclass(stype, sectypes.SecureInteger):
        # round to nearest, matching reference statistics.py:138-147
        if m is None:
            s = runtime.sum(data)
            y = [a * n - s for a in data]
            d = n ** 2 * (n - correction)
        else:
            y = runtime.vector_sub(data, [m] * n)
            d = n - correction
        return (runtime.in_prod(y, y) + d // 2) // d
    raise TypeError('secure fixed-point or integer type required')


def _std(data, m, correction):
    stype = type(data[0])
    if not issubclass(stype, sectypes.SecureObject):
        if correction:
            return _stats.stdev(data, m)
        return _stats.pstdev(data, m)
    if issubclass(stype, sectypes.SecureFixedPoint):
        return _fsqrt(_var(data, m, correction))
    if issubclass(stype, sectypes.SecureInteger):
        return _isqrt(_var(data, m, correction))
    raise TypeError('secure fixed-point or integer type required')


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
    return _med(_check(data, 1, 'median'))


def median_low(data):
    """Secure low median of data."""
    return _med(_check(data, 1, 'median'), med='low')


def median_high(data):
    """Secure high median of data."""
    return _med(_check(data, 1, 'median'), med='high')


def _med(data, med=None):
    n = len(data)
    stype = type(data[0])
    if not issubclass(stype, sectypes.SecureObject):
        if med == 'low':
            return _stats.median_low(data)
        if med == 'high':
            return _stats.median_high(data)
        return _stats.median(data)
    if not issubclass(stype, (sectypes.SecureFixedPoint,
                              sectypes.SecureInteger)):
        raise TypeError('secure fixed-point or integer type required')
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
    if n < 1:
        raise _stats.StatisticsError('n must be at least 1')
    data = _check(data, 2, 'quantiles')
    ld = len(data)
    stype = type(data[0])
    if not issubclass(stype, sectypes.SecureObject):
        return _stats.quantiles(data, n=n, method=method)
    if not issubclass(stype, (sectypes.SecureFixedPoint,
                              sectypes.SecureInteger)):
        raise TypeError('secure fixed-point or integer type required')
    is_fxp = issubclass(stype, sectypes.SecureFixedPoint)
    x = runtime.sorted(data)
    result = []
    if method == 'inclusive':
        m = ld - 1
        for i in range(1, n):
            j, delta = divmod(i * m, n)
            interp = x[j] * (n - delta) + x[j + 1] * delta
            result.append(interp / n if is_fxp else (interp + n // 2) // n)
        return result
    if method == 'exclusive':
        m = ld + 1
        for i in range(1, n):
            j = i * m // n
            j = 1 if j < 1 else (ld - 1 if j > ld - 1 else j)
            delta = i * m - j * n
            interp = x[j - 1] * (n - delta) + x[j] * delta
            result.append(interp / n if is_fxp else (interp + n // 2) // n)
        return result
    raise ValueError(f'unknown method: {method!r}')


def mode(data):
    """Secure mode: the most common data point (ties: smallest value wins)."""
    data = _check(data, 1, 'mode')
    n = len(data)
    stype = type(data[0])
    if not issubclass(stype, sectypes.SecureObject):
        return _stats.mode(data)
    if not issubclass(stype, (sectypes.SecureFixedPoint,
                              sectypes.SecureInteger)):
        raise TypeError('secure fixed-point or integer type required')
    if issubclass(stype, sectypes.SecureFixedPoint) and \
            not all(a.integral for a in data):
        raise ValueError('integral values required')
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
    x, y = list(x), list(y)
    n = len(x)
    if len(y) != n:
        raise _stats.StatisticsError('covariance requires that both inputs '
                                     'have same number of data points')
    if n < 2:
        raise _stats.StatisticsError(
            'covariance requires at least two data points')
    stype = type(x[0])
    if not issubclass(stype, sectypes.SecureObject):
        return _stats.covariance(x, y)
    if issubclass(stype, sectypes.SecureFixedPoint):
        xbar = mean(x)
        ybar = mean(y)
        d = runtime.in_prod([a - xbar for a in x], [b - ybar for b in y])
        return d / (n - 1)
    if issubclass(stype, sectypes.SecureInteger):
        # round to nearest (reference statistics.py:515-521)
        sx = runtime.sum(x)
        sy = runtime.sum(y)
        sxy = runtime.in_prod([xi * n - sx for xi in x],
                              [yi * n - sy for yi in y])
        d = n ** 2 * (n - 1)
        return (sxy + d // 2) // d
    raise TypeError('secure fixed-point or integer type required')


def correlation(x, y):
    """Secure Pearson correlation coefficient of x and y (fxp only)."""
    x, y = list(x), list(y)
    n = len(x)
    if len(y) != n:
        raise _stats.StatisticsError('correlation requires that both inputs '
                                     'have same number of data points')
    if n < 2:
        raise _stats.StatisticsError(
            'correlation requires at least two data points')
    stype = type(x[0])
    if not issubclass(stype, sectypes.SecureObject):
        return _stats.correlation(x, y)
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
    x, y = list(x), list(y)
    n = len(x)
    if len(y) != n:
        raise _stats.StatisticsError('linear regression requires that both '
                                     'inputs have same number of data points')
    if n < 2:
        raise _stats.StatisticsError(
            'linear regression requires at least two data points')
    stype = type(x[0])
    if not issubclass(stype, sectypes.SecureObject):
        return _stats.linear_regression(x, y)
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
