"""Low-depth alternatives for itertools/functools patterns.

Parity target: /root/reference/mpyc/mpctools.py — reduce() and accumulate()
arranged as logarithmic-depth trees/prefix networks (Sklansky minimizes
depth, Brent-Kung minimizes the number of applications).
"""

import operator

runtime = None

_no_value = type('mpyc_tpu.mpctools.NoValueType', (object,),
                 {'__repr__': lambda self: '<no value>'})()


def reduce(f, x, initial=_no_value):
    """Tree-reduce iterable x with associative f (log depth)."""
    x = list(x)
    if initial is not _no_value:
        x.insert(0, initial)
    if not x:
        raise TypeError('reduce() of empty sequence with no initial value')
    while len(x) > 1:
        x[len(x) % 2:] = (f(x[i], x[i + 1])
                          for i in range(len(x) % 2, len(x), 2))
    return x[0]


def accumulate(x, f=operator.add, initial=_no_value, method=None):
    """Log-depth prefix accumulation of x under associative f.

    method 'Sklansky' minimizes depth, 'Brent-Kung' minimizes applications;
    the default heuristic matches the reference (mpctools.py:72-74).
    """
    x = list(x)
    if initial is not _no_value:
        x.insert(0, initial)
    n = len(x)
    if method is None:
        method = 'Brent-Kung' if getattr(runtime.options, 'no_prss', False) \
            and n >= 32 else 'Sklansky'
    if method == 'Brent-Kung':
        def acc(i, j):
            h = (i + j) // 2
            if i < h:
                acc(i, h)
                a = x[h - 1]
                if i:
                    x[h - 1] = f(x[i - 1], a)
                acc(h, j)
                x[j - 1] = f(a, x[j - 1])
    elif method == 'Sklansky':
        def acc(i, j):
            h = (i + j) // 2
            if i < h:
                acc(i, h)
                a = x[h - 1]
                acc(h, j)
                x[h:j] = (f(a, b) for b in x[h:j])
    else:
        raise ValueError('invalid method')
    acc(0, n)
    return iter(x)
