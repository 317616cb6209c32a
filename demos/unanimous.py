"""Demo: unanimous voting — multiparty matching without embarrassments.

Counterpart of the reference demos/unanimous.py: parties P[0..t] each
input a private yes/no bit over GF(2); t additional trusted parties
P[t+1..2t] provide no input and receive no output.  Only the product of
the votes (1 = unanimous agreement) is revealed, and only to the voters,
so any t colluding voters learn nothing about a dissenting vote.

Usage: python demos/unanimous.py [-M m] [vote]   (m odd; vote 0 or 1)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def main():
    m = len(mpc.parties)
    if m % 2 == 0:
        print('Odd number of parties required.')
        sys.exit()

    t = m // 2
    voters = list(range(t + 1))  # parties P[0],...,P[t]

    pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    if mpc.pid in voters:
        vote = int(pos[0]) if pos else 1  # default "yes"
    else:
        vote = None  # no input

    secbit = mpc.SecFld(2)  # secure bits over GF(2)

    mpc.run(mpc.start())
    if getattr(mpc, 'is_simulator', False):
        # one process plays all voters: positional args give their votes
        votes = [mpc.input(secbit(int(pos[j]) if j < len(pos) else 1),
                           senders=j) for j in voters]
    else:
        votes = mpc.input(secbit(vote), senders=voters)
    result = mpc.run(mpc.output(mpc.all(votes), receivers=voters))
    mpc.run(mpc.shutdown())

    if result is None:  # no output
        print('Thanks for serving as oblivious matchmaker;)')
    elif result:
        print(f'Match: unanimous agreement between {t+1} part{"ies" if t else "y"}!')
    else:
        print(f'No match: someone disagrees among {t+1} part{"ies" if t else "y"}?')


if __name__ == '__main__':
    main()
