"""Fused co-located comparison kernel (pipelines.make_sgn_step).

The whole Toft-style comparison runs as one compiled program on the sim
plane (SimRuntime.np_sgn fast path). Tiny parameters (l=6, k=8, L=1
field) keep the one-time XLA compile short; correctness is checked
against plaintext signum for all three modes through the public API.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu import gmpy
from mpyc_tpu.runtime import _Options


def _make_sim(sec_param=None):
    from mpyc_tpu.parallel.simulator import SimRuntime
    opts = _Options()
    if sec_param is not None:
        opts.sec_param = sec_param
    return SimRuntime(3, opts)


@pytest.fixture
def sim(request):
    old = sectypes.runtime
    rt = _make_sim(sec_param=8)   # tiny k keeps the CPU compiles short
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


@pytest.fixture
def sim_default_k(request):
    """Default sec_param (k=30): the TPU-gated tests must ride the
    kernels tools/warm_caches.py seeds (the compile key includes k, so a
    test-only k would force a fresh ~5-10 min remote compile)."""
    old = sectypes.runtime
    rt = _make_sim()
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def _device_input(mpc, secint, vals):
    x = mpc.input(secint.array(np.array(vals, dtype=object)), senders=0)
    # force the device path (host shares take the eager plane)
    x.share = secint.field.array.from_data(jnp.asarray(np.asarray(x.share.data)))
    return x


def test_sgn_fused_modes(sim):
    mpc = sim
    p = int(gmpy.next_prime(1 << 17))
    secint = mpc.SecInt(6, p=p)
    vals = [-31, -2, -1, 0, 1, 2, 17, 31] * 3       # n=24 -> bucket 32
    x = _device_input(mpc, secint, vals)

    z = mpc.np_sgn(x, LT=True)
    assert not isinstance(z.share.data, np.ndarray), 'fused path not taken'
    got = [int(v) for v in np.asarray(
        mpc.run(mpc.output(z))).reshape(-1)]
    assert got == [1 if v < 0 else 0 for v in vals]

    got = [int(v) for v in np.asarray(
        mpc.run(mpc.output(mpc.np_sgn(x)))).reshape(-1)]
    assert got == [(v > 0) - (v < 0) for v in vals]

    got = [int(v) for v in np.asarray(
        mpc.run(mpc.output(mpc.np_sgn(x, EQ=True)))).reshape(-1)]
    assert got == [1 if v == 0 else 0 for v in vals]


def test_sgn_fused_matches_eager(sim):
    """Device fused path and host eager path agree on opened values."""
    mpc = sim
    p = int(gmpy.next_prime(1 << 17))
    secint = mpc.SecInt(6, p=p)
    vals = list(range(-12, 12))
    x_host = mpc.input(secint.array(np.array(vals, dtype=object)), senders=0)
    x_dev = _device_input(mpc, secint, vals)
    eager = [int(v) for v in np.asarray(
        mpc.run(mpc.output(mpc.np_sgn(x_host, LT=True)))).reshape(-1)]
    fused = [int(v) for v in np.asarray(
        mpc.run(mpc.output(mpc.np_sgn(x_dev, LT=True)))).reshape(-1)]
    assert eager == fused


def test_sgn_secint64_routed(sim_default_k):
    """SecInt(64) comparisons through np_sgn on whatever plane the backend
    routes to (CPU: eager host plane — the fused graph is TPU-only there;
    TPU: the whole-protocol Pallas kernel).  Default sec_param so the TPU
    run rides the kernels tools/warm_caches.py seeds."""
    mpc = sim_default_k
    secint = mpc.SecInt(64)
    big = 1 << 62
    vals = [-big, -(1 << 33), -1, 0, 1, (1 << 33) + 5, big - 1, 42]
    x = _device_input(mpc, secint, vals)
    got = [int(v) for v in np.asarray(
        mpc.run(mpc.output(mpc.np_sgn(x)))).reshape(-1)]
    assert got == [(v > 0) - (v < 0) for v in vals]
    got = [int(v) for v in np.asarray(
        mpc.run(mpc.output(mpc.np_sgn(x, LT=True)))).reshape(-1)]
    assert got == [1 if v < 0 else 0 for v in vals]


needs_tpu = pytest.mark.skipif(
    jax.default_backend() == 'cpu',
    reason='fused SecInt(64) comparison needs the TPU compile path; '
           'run with MPYC_TPU_TEST_BACKEND=tpu')


@needs_tpu
def test_sgn_fused_secint64_tpu(sim_default_k):
    """Bit-exact fused SecInt(64) sgn on the TPU (the l <= 62 cap is
    lifted): the whole-protocol kernel handles multi-limb fields and
    values straddling limb boundaries."""
    mpc = sim_default_k
    secint = mpc.SecInt(64)
    big = 1 << 62
    rnd = np.random.default_rng(7)
    vals = ([-big, -(1 << 33), -1, 0, 1, (1 << 33) + 5, big - 1, 42]
            * 4 + [int(v) for v in
                   rnd.integers(-big, big, 2016, dtype=np.int64)])
    x = _device_input(mpc, secint, vals)
    z = mpc.np_sgn(x)
    assert not isinstance(z.share.data, np.ndarray), 'fused path not taken'
    got = [int(v) for v in np.asarray(mpc.run(mpc.output(z))).reshape(-1)]
    assert got == [(v > 0) - (v < 0) for v in vals]


@needs_tpu
def test_sgn_fused_secfxp64_tpu(sim_default_k):
    """SecFxp(64, 32) less-than through the fused comparison (f-shifted
    output bit)."""
    mpc = sim_default_k
    secfxp = mpc.SecFxp(64, 32)
    vals = [-2.5, -0.25, 0.0, 0.5, 3.75, -1024.0, 1024.0, 7.0]
    x = _device_input(mpc, secfxp, vals)
    z = mpc.np_less(x, 0)
    assert not isinstance(z.share.data, np.ndarray), 'fused path not taken'
    got = [float(v) for v in np.asarray(mpc.run(mpc.output(z))).reshape(-1)]
    assert got == [1.0 if v < 0 else 0.0 for v in vals]
