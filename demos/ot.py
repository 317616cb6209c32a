"""Demo: 1-out-of-2 oblivious transfer (OT) via honest-majority MPC.

Counterpart of the reference demos/ot.py: with m = 2t+1 parties, t OTs
run in parallel.  P[0] is a trusted helper with no input/output; P[i]
(1<=i<=t) is a sender holding two messages; P[t+i] is the receiver with
a private choice bit, obtaining x[b] as private output via
    OT(x[0], x[1]; b) = if_else(b, x[1], x[0])
one secure multiplication per transfer.

Usage: python demos/ot.py [-M m]   (m odd)
"""
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def main():
    m = len(mpc.parties)
    if m % 2 == 0:
        print('OT runs with odd number of parties only.')
        sys.exit()

    t = m // 2
    message = [(None, None)] * t
    choice = [None] * t
    if getattr(mpc, 'is_simulator', False):
        # co-located plane: the one program plays every party
        for j in range(t):
            message[j] = (random.randint(0, 99), random.randint(0, 99))
            choice[j] = random.randint(0, 1)
        print(f'Simulating {t} senders and {t} receivers.')
    elif mpc.pid == 0:
        print('You are the trusted third party.')
    elif 1 <= mpc.pid <= t:
        message[mpc.pid - 1] = (random.randint(0, 99), random.randint(0, 99))
        print(f'You are sender {mpc.pid} holding messages '
              f'{message[mpc.pid - 1][0]} and {message[mpc.pid - 1][1]}.')
    else:
        choice[mpc.pid - t - 1] = random.randint(0, 1)
        print(f'You are receiver {mpc.pid - t} with random choice '
              f'bit {choice[mpc.pid - t - 1]}.')

    mpc.run(mpc.start())
    secint = mpc.SecInt()
    for i in range(1, t + 1):
        x = mpc.input([secint(message[i-1][0]), secint(message[i-1][1])], i)
        b = mpc.input(secint(choice[i-1]), t + i)
        a = mpc.run(mpc.output(mpc.if_else(b, x[1], x[0]), t + i))
        if a is not None:
            a = int(a)
            print(f'You have received message {a}.')
            assert a == message[i-1][choice[i-1]] if mpc.pid == 0 else True
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
