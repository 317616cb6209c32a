"""Demo: 1-out-of-2 oblivious transfer (OT) via honest-majority MPC.

Counterpart of the reference demos/ot.py. With m = 2t+1 parties, t
transfers run at once: party i (1 <= i <= t) plays sender number i with
a private message pair, party t+i plays receiver number i with a private
choice bit, and party 0 is the non-colluding helper that makes the
honest majority work. Receiver i obtains x[b] — and nothing about
x[1-b] — through one secure multiplexer

    selected = x0 + b * (x1 - x0)

opened only towards that receiver.

Usage: python demos/ot.py [-M m]   (m odd)
"""
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def my_roles():
    """(pair, bit) this process contributes: senders hold a message pair,
    receivers a choice bit, the helper neither. On the co-located plane
    one process plays everyone."""
    m = len(mpc.parties)
    t = m // 2
    pairs = {}
    bits = {}
    if getattr(mpc, 'is_simulator', False):
        for i in range(1, t + 1):
            pairs[i] = (random.randrange(100), random.randrange(100))
            bits[i] = random.getrandbits(1)
        print(f'Simulating {t} sender/receiver pairs.')
    else:
        pid = mpc.pid
        if pid == 0:
            print('You are the helper party (no input, no output).')
        elif pid <= t:
            pairs[pid] = (random.randrange(100), random.randrange(100))
            print(f'Sender {pid}: messages {pairs[pid][0]} / {pairs[pid][1]}')
        else:
            bits[pid - t] = random.getrandbits(1)
            print(f'Receiver {pid - t}: choice bit {bits[pid - t]}')
    return pairs, bits


def main():
    if len(mpc.parties) % 2 == 0:
        sys.exit('ot.py needs an odd party count (m = 2t + 1)')
    t = len(mpc.parties) // 2
    pairs, bits = my_roles()

    mpc.run(mpc.start())
    secint = mpc.SecInt()
    for i in range(1, t + 1):
        pair = pairs.get(i, (None, None))
        x0, x1 = mpc.input([secint(pair[0]), secint(pair[1])], senders=i)
        b = mpc.input(secint(bits.get(i)), senders=t + i)
        selected = x0 + b * (x1 - x0)
        got = mpc.run(mpc.output(selected, receivers=t + i))
        if got is not None:
            got = int(got)
            print(f'Transfer {i}: received message {got}.')
            if i in pairs:  # co-located plane: check against the pair
                assert got == pairs[i][bits[i]]
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
