"""Batched SHA3/SHAKE demo (demos/np_sha3.py): hashlib-exact digests for
a batch of secret-shared messages, at m=1 and on the sim plane at m=3
(exercises the batched GF(2) chi rounds and the public-operand
np_concatenate path)."""
import hashlib
import os
import sys

import numpy as np
import pytest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu.runtime import Runtime, Party, _Options

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'demos'))


@pytest.fixture(params=['m1', 'sim3'])
def mpc(request):
    old = sectypes.runtime
    if request.param == 'sim3':
        from mpyc_tpu.parallel.simulator import SimRuntime
        rt = SimRuntime(3, _Options())
    else:
        rt = Runtime(0, [Party(0)], _Options())
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def test_np_sha3_batch(mpc):
    import np_sha3 as demo
    from sha3 import bytes_to_bits, bits_to_bytes

    demo.mpc = mpc          # route the demo module at this fixture runtime
    import sha3 as sha3_demo
    sha3_demo.mpc = mpc
    secfld = mpc.SecFld(2)
    demo.secfld = secfld
    msgs = [b'abc', b'xyz']
    bits = np.stack([bytes_to_bits(m) for m in msgs])
    M = mpc.input(secfld.array(bits), senders=0)
    digests = mpc.run(mpc.output(demo.np_sha3(M, 256), raw=True)).value
    for i, m in enumerate(msgs):
        assert bits_to_bytes(digests[i]) == hashlib.sha3_256(m).digest()


def test_np_shake_batch(mpc):
    import np_sha3 as demo
    from sha3 import bytes_to_bits, bits_to_bytes

    demo.mpc = mpc
    secfld = mpc.SecFld(2)
    demo.secfld = secfld
    msgs = [b'', b'hello123']
    bits_list = [bytes_to_bits(m) for m in msgs]
    # equal-length requirement: pad the empty message batch separately
    M = mpc.input(secfld.array(np.stack([bits_list[1], bits_list[1]])),
                  senders=0)
    digests = mpc.run(mpc.output(demo.np_shake(M, 128), raw=True)).value
    exp = hashlib.shake_128(msgs[1]).digest(16)
    assert bits_to_bytes(digests[0]) == exp
    assert bits_to_bytes(digests[1]) == exp
