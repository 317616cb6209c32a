"""Keccak/SHAKE128 device kernel: bit-exactness vs hashlib."""
from hashlib import shake_128

import numpy as np

from mpyc_tpu.ops import keccak


def test_shake128_matches_hashlib():
    for data in (b'', b'abc', b'x' * 167, b'y' * 168, b'z' * 300):
        for n in (1, 32, 168, 336):
            assert keccak.shake128_device(data, n) == shake_128(data).digest(n)


def test_ctr_instance0_is_plain_stream():
    """Counter 0 XORs nothing: instance 0 == first hashlib SHAKE block."""
    prefix = bytes(range(24))
    blocks = np.asarray(keccak.shake128_ctr_blocks(prefix, 3))
    expect = shake_128(prefix).digest(keccak.RATE)
    got = blocks[0].astype('<u4').tobytes()
    assert got == expect
    # other instances differ from the plain stream and from each other
    assert not (blocks[1] == blocks[0]).all()
    assert not (blocks[1] == blocks[2]).all()


def test_ctr_deterministic():
    prefix = b'k' * 24
    a = np.asarray(keccak.shake128_ctr_blocks(prefix, 4))
    b = np.asarray(keccak.shake128_ctr_blocks(prefix, 4))
    assert (a == b).all()
