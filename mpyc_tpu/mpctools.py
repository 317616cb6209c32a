"""Low-depth alternatives for itertools/functools patterns.

Parity target: /root/reference/mpyc/mpctools.py — reduce() and accumulate()
arranged as logarithmic-depth trees/prefix networks (Sklansky minimizes
depth, Brent-Kung minimizes the number of applications).

Implementation note: both prefix networks are written ITERATIVELY as
span-doubling passes over the list (upsweep/downsweep for Brent-Kung,
block-pivot fan-out for Sklansky) rather than as recursive interval
splits — the same f-schedules, expressed as flat loops, which also keeps
Python recursion depth flat for very long inputs.
"""

import operator

runtime = None


class _NoValue:
    """Sentinel distinct from every value, including None."""

    def __repr__(self):
        return '<no value>'


_no_value = _NoValue()


def _seeded(x, initial):
    """Materialize the input, leading with the initial value if given."""
    seq = ([] if initial is _no_value else [initial])
    seq.extend(x)
    return seq


def reduce(f, x, initial=_no_value):
    """Tree-reduce iterable x with associative f (log depth).

    Pairs adjacent elements level by level (leftmost element rides along
    unpaired on odd levels), so operand order is preserved for
    non-commutative f while the depth stays logarithmic.
    """
    x = _seeded(x, initial)
    if not x:
        raise TypeError('reduce() of empty sequence with no initial value')
    while len(x) > 1:
        odd = len(x) % 2
        head = x[:odd]
        x = head + [f(x[i], x[i + 1]) for i in range(odd, len(x) - 1, 2)]
    return x[0]


def accumulate(x, f=operator.add, initial=_no_value, method=None):
    """Log-depth prefix accumulation of x under associative f.

    method 'Sklansky' minimizes depth (ceil(log2 n) rounds), 'Brent-Kung'
    minimizes applications (~2n calls, ~2 log2 n rounds); the default
    heuristic matches the reference (mpctools.py:72-74): Brent-Kung when
    randomness is interactive (--no-prss) and the input is long.
    """
    x = _seeded(x, initial)
    n = len(x)
    if method is None:
        interactive = getattr(runtime.options, 'no_prss', False)
        method = 'Brent-Kung' if interactive and n >= 32 else 'Sklansky'
    if method == 'Brent-Kung':
        # upsweep: span-doubling partial sums at positions 2d-1, 4d-1, ...
        d = 1
        while 2 * d <= n:
            for k in range(2 * d - 1, n, 2 * d):
                x[k] = f(x[k - d], x[k])
            d *= 2
        # downsweep: fill the remaining prefixes from the partial sums
        d //= 2
        while d >= 1:
            for k in range(3 * d - 1, n, 2 * d):
                x[k] = f(x[k - d], x[k])
            d //= 2
    elif method == 'Sklansky':
        # per level, each 2*span block fans its mid-point prefix into the
        # whole second half of the block (depth-optimal)
        span = 1
        while span < n:
            for blk in range(0, n, 2 * span):
                mid = blk + span
                if mid >= n:
                    break
                pivot = x[mid - 1]
                for j in range(mid, min(mid + span, n)):
                    x[j] = f(pivot, x[j])
            span *= 2
    else:
        raise ValueError('invalid method')
    return iter(x)
