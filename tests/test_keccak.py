"""Keccak/SHAKE128 device kernel: bit-exactness vs hashlib."""
from hashlib import shake_128

import numpy as np

from mpyc_tpu.ops import keccak


def test_shake128_matches_hashlib():
    for data in (b'', b'abc', b'x' * 167, b'y' * 168, b'z' * 300):
        for n in (1, 32, 168, 336):
            assert keccak.shake128_device(data, n) == shake_128(data).digest(n)


def test_ctr_instances_match_hashlib():
    """Instance j == shake_128(prefix || pad8 || ctr_j): every instance is
    an ordinary hashlib digest of the counter-mode message layout."""
    for prefix in (bytes(range(24)), b'', b'k' * 31):
        pad = (-len(prefix)) % 8
        blocks = np.asarray(keccak.shake128_ctr_blocks(prefix, 3))
        for j in range(3):
            msg = prefix + bytes(pad) + j.to_bytes(8, 'little')
            expect = shake_128(msg).digest(keccak.RATE)
            assert blocks[j].astype('<u4').tobytes() == expect


def test_ctr_paths_agree():
    """hashlib, numpy and jit paths produce identical blocks."""
    prefix = b'p' * 17
    small = np.asarray(keccak.shake128_ctr_blocks(prefix, 5))
    old_hl, old_host = keccak._HASHLIB_N, keccak._HOST_SHAKE_N
    try:
        keccak._HASHLIB_N = 0
        host = np.asarray(keccak.shake128_ctr_blocks(prefix, 5))
        keccak._HOST_SHAKE_N = 0
        dev = np.asarray(keccak.shake128_ctr_blocks(prefix, 5))
    finally:
        keccak._HASHLIB_N, keccak._HOST_SHAKE_N = old_hl, old_host
    assert (small == host).all()
    assert (small == dev).all()


def test_ctr_deterministic():
    prefix = b'k' * 24
    a = np.asarray(keccak.shake128_ctr_blocks(prefix, 4))
    b = np.asarray(keccak.shake128_ctr_blocks(prefix, 4))
    assert (a == b).all()
