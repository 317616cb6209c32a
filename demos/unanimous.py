"""Demo: unanimous voting — multiparty matching without embarrassments.

Counterpart of the reference demos/unanimous.py. With m = 2t+1 parties,
the first t+1 are voters holding a private yes/no bit over GF(2); the
remaining t act as non-colluding helpers with neither input nor output.
Only the AND of all votes is opened, and only towards the voters: a
dissenting voter is never exposed to any coalition of t parties, because
the helpers guarantee an honest majority for the (t+1)-voter AND.

The t=1 case is "matching without embarrassments": two parties learn
whether they both said yes, with a trusted third wheel making the
3-party honest-majority computation possible.

Usage: python demos/unanimous.py [-M m] [vote]   (m odd; vote 0 or 1)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def main():
    m = len(mpc.parties)
    if m % 2 == 0:
        sys.exit('unanimous.py needs an odd party count (m = 2t + 1)')
    t = m // 2
    n_voters = t + 1

    args = [a for a in sys.argv[1:] if not a.startswith('-')]
    i_vote = mpc.pid < n_voters
    my_vote = (int(args[0]) if args else 1) if i_vote else None

    secbit = mpc.SecFld(2)

    mpc.run(mpc.start())
    if getattr(mpc, 'is_simulator', False):
        # one process plays every voter: one positional arg per voter
        ballots = [mpc.input(secbit(int(args[j]) if j < len(args) else 1),
                             senders=j) for j in range(n_voters)]
    else:
        ballots = mpc.input(secbit(my_vote), senders=list(range(n_voters)))
    verdict = mpc.run(mpc.output(mpc.all(ballots),
                                 receivers=list(range(n_voters))))
    mpc.run(mpc.shutdown())

    if verdict is None:
        print('Helper party: served obliviously, learned nothing ;)')
    elif verdict:
        print(f'MATCH — all {n_voters} voter(s) said yes!')
    else:
        print(f'NO match — at least one of the {n_voters} voter(s) said no.')


if __name__ == '__main__':
    main()
