"""Demo: secure decision-tree learning (ID3 with Gini impurity).

Counterpart of the reference demos/id3gini.py + np_id3gini.py: the
parties jointly build an ID3 decision tree from a secret-shared one-hot
encoded transaction database.  At each node the attribute with the best
Gini impurity is selected via a secure fraction tournament; only the
chosen attribute (part of the public tree) is revealed.

TPU-first data flow: per candidate attribute the class contingency
table is ONE secure matmul S[A] @ (T * S[C])^T, and the Gini numerator
uses exact field division D / y (all quotients are integral), so a node
costs a handful of batched rounds regardless of the dataset size.

Usage: python demos/id3gini.py [-M m] [-i I] [-l L] [-e E] [-a A]
  datasets: 0=tennis (default), 1=balance-scale, 2=car, 3=SPECT,
            4=KRKPA7, 5=tic-tac-toe, 6=house-votes-84
"""
import argparse
import csv
import logging
import os
import sys

DEMO_DIR = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(DEMO_DIR, '..'))

import numpy as np

from mpyc_tpu.runtime import mpc

args = None
secint = None
C = None  # class attribute index
S = None  # one-hot encoded attributes


class SecureFraction:
    """Nonnegative fraction [numerator, denominator] ordered by x-mul."""

    def __init__(self, a):
        self.a = a  # [num, den]

    def __lt__(self, other):
        return self.a[0] * other.a[1] < self.a[1] * other.a[0]


def GI(x):
    """Gini impurity of contingency table x as fraction [D*G, D].

    D = prod_a y_a with y_a = alpha*|T_a| + 1 (guards division by zero);
    D*G = sum_a (sum_c x_ac^2) * D/y_a, with D/y_a an exact integer
    computed by field division (reference np_id3gini.py GI)."""
    y = mpc.np_sum(x, axis=1) * args.alpha + 1
    D = mpc.np_prod(y)
    sq = mpc.np_sum(x * x, axis=1)
    Dy = mpc.div(D, y)  # exact integral quotients, one masked open
    DG = mpc.np_sum(sq * Dy)
    return [DG, D]


def id3(T, R):
    """Build the tree for transaction subset T over attribute set R."""
    sizes = S[C] @ T
    i, mx = mpc.np_argmax(sizes, arg_only=False)
    sizeT = mpc.np_sum(sizes)
    stop = (sizeT <= int(args.epsilon * int(T.shape[0]))) + (mx == sizeT)
    if not (R and mpc.run(mpc.is_zero_public(stop))):
        i = int(mpc.run(mpc.output(i)))
        logging.info('Leaf node label %d', i)
        tree = i
    else:
        T_SC = mpc.np_transpose(T * S[C])
        fracs = [GI(S[A] @ T_SC) for A in sorted(R)]
        k, _ = mpc.argmax(fracs, key=SecureFraction)
        A = sorted(R)[int(mpc.run(mpc.output(k)))]
        logging.info('Attribute node %d', A)
        T_SA = T * S[A]
        subtrees = [id3(T_SA[j], R.difference([A]))
                    for j in range(int(T_SA.shape[0]))]
        tree = A, subtrees
    return tree


def depth(tree):
    return 0 if isinstance(tree, int) else max(map(depth, tree[1])) + 1


def size(tree):
    return 1 if isinstance(tree, int) else sum(map(size, tree[1])) + 1


def pretty(prefix, tree, names, ranges):
    """Multiline textual tree with attribute names and values."""
    if isinstance(tree, int):  # leaf
        return ranges[C][tree]

    A, subtrees = tree
    s = ''
    for a, t in zip(ranges[A], subtrees):
        s += f'\n{prefix}{names[A]} == {a}: ' \
             f'{pretty("|   " + prefix, t, names, ranges)}'
    return s


def main():
    global args, secint, C, S

    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--dataset', type=int, metavar='I',
                        help=('dataset 0=tennis (default), 1=balance-scale, '
                              '2=car, 3=SPECT, 4=KRKPA7, 5=tic-tac-toe, '
                              '6=house-votes-84'))
    parser.add_argument('-l', '--bit-length', type=int, metavar='L',
                        help='override preset bit length for dataset')
    parser.add_argument('-e', '--epsilon', type=float, metavar='E',
                        help='minimum fraction E of samples for a split')
    parser.add_argument('-a', '--alpha', type=int, metavar='A',
                        help='scale factor A to prevent division by zero')
    parser.add_argument('--no-pretty-tree', action='store_true',
                        help='print raw flat tree instead of pretty tree')
    parser.set_defaults(dataset=0, bit_length=0, alpha=8, epsilon=0.05)
    args, _ = parser.parse_known_args()

    settings = [('tennis', 32), ('balance-scale', 77), ('car', 95),
                ('SPECT', 42), ('KRKPA7', 69), ('tic-tac-toe', 75),
                ('house-votes-84', 62)]
    name, bit_length = settings[args.dataset]
    if args.bit_length:
        bit_length = args.bit_length
    secint = mpc.SecInt(bit_length)
    print(f'Using secure integers: {secint.__name__}')

    with open(os.path.join(DEMO_DIR, 'data', 'id3', name + '.csv')) as file:
        reader = csv.reader(file)
        attr_names = next(reader)
        # class attribute is first or last column
        C = 0 if attr_names[0].lower().startswith('class') \
            else len(attr_names) - 1
        transactions = list(reader)
    n, d = len(transactions), len(attr_names)
    attr_ranges = [sorted({t[i] for t in transactions}) for i in range(d)]
    # one-hot encoding of attributes:
    S = [secint.array(np.array([[int(t[i] == j) for t in transactions]
                                for j in attr_ranges[i]], dtype=object))
         for i in range(d)]
    T = secint.array(np.ones(n, dtype=object))
    print(f'dataset: {name} with {n} samples and {d-1} attributes')

    mpc.run(mpc.start())
    tree = id3(T, frozenset(range(d)).difference([C]))
    mpc.run(mpc.shutdown())

    print(f'Decision tree of depth {depth(tree)} and size {size(tree)}: ',
          end='')
    if args.no_pretty_tree:
        print(tree)
    else:
        print(pretty('if ', tree, attr_names, attr_ranges))


if __name__ == '__main__':
    main()
