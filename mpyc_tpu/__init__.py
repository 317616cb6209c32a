"""MPyC-TPU: a TPU-native secure multiparty computation framework.

Capability parity target: lschoe/mpyc (mounted read-only at
/root/reference). Shamir secret sharing over finite fields with m parties
and threshold t < m/2, operator-overloaded secure types, and a protocol
runtime — redesigned TPU-first: field elements are uint32 limb arrays with
jitted Montgomery kernels, randomness is batched counter-mode SHAKE128, and
protocol ops are explicit rounds of fused device kernels between pc-tagged
exchanges (or mesh collectives on the co-located simulator plane).

Typical use::

    from mpyc_tpu.runtime import mpc
    secint = mpc.SecInt(32)
    mpc.run(mpc.start())
    x = mpc.input(secint(7))
    s = mpc.run(mpc.output(mpc.sum(x)))
    mpc.run(mpc.shutdown())
"""

__version__ = '0.1.0'

runtime = None  # the singleton Runtime, set by mpyc_tpu.runtime.setup()
