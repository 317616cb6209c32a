"""Demo: secret index to secret unit vector.

Counterpart of the reference demos/indextounitvector.py: turn a secret
index a into the secret a-th unit vector of public length n, for secure
prime fields, integers, and fixed-point numbers. Two constructions are
exercised: the built-in mpc.unit_vector(), and bit_kron() below — an
iterative binary-expansion construction (different from the reference's
recursive odd/even halving): peel the low bit of a for k = ceil(log2 n)
levels, then double a one-hot vector back up, each level interleaving
the (1-b)-selected and b-selected halves.

Usage: python demos/indextounitvector.py [-M m] [n]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def bit_kron(a, n):
    """a-th unit vector of length n (0 <= a < n) via binary expansion.

    u(a) = kron_{j=k-1..0} (1-b_j, b_j) truncated to n entries: with
    a = 2q + b, the length-2L one-hot of a interleaves the length-L
    one-hot of q scaled by 1-b (even slots) and by b (odd slots).
    """
    stype = type(a)
    levels = max((n - 1).bit_length(), 1)
    low_bits = []
    for _ in range(levels):
        a, bit = divmod(a, 2)
        low_bits.append(bit)

    one_hot = [stype(1)]
    for bit in reversed(low_bits):
        odd = mpc.scalar_mul(bit, one_hot)
        even = mpc.vector_sub(one_hot, odd)
        one_hot = [v for pair in zip(even, odd) for v in pair]
    return one_hot[:n]


def check_all(n, builder, sectype):
    print(f'Using {builder.__name__} with type {sectype.__name__}:')
    for i in range(n):
        vec = mpc.run(mpc.output(builder(sectype(i), n)))
        print(i, vec)
        assert [int(v) for v in vec] == [int(j == i) for j in range(n)], \
            (i, vec)


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    n = int(pos[0]) if pos else 10
    if not pos:
        print('Setting input to default =', n)

    mpc.run(mpc.start())
    secfld = mpc.SecFld(min_order=max(len(mpc.parties) + 1, n))
    check_all(n, mpc.unit_vector, secfld)
    # bit_kron needs integer divmod, so no secfld here
    for sectype in (mpc.SecInt(), mpc.SecFxp()):
        check_all(n, mpc.unit_vector, sectype)
        check_all(n, bit_kron, sectype)
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
