"""Pre-seed the persistent trace/compile caches for the demo shape set.

Run ONCE after install (or let CI do it): populates
``<repo>/.cache_seed`` (via the fixed /tmp/mpyc-tpu-cache path; utils/tracecache.py) — the jax.export trace cache
and the persistent XLA compilation cache (mpyc_tpu.enable_compile_cache)
— with every fused protocol program the batched demos touch, so the
first real run executes at warm speed. Compilation on remote-attached
TPUs is a network round trip per program; a cold np_aes -b 64 run paid
~440 of them (measured: 150 s cold vs 13 s seeded).

The shapes covered (all through the public API, m=3, t=1):
  * secure mul/reshare buckets for SecInt(32) (64..1M, powers of two)
  * fused comparisons (sgn/LT/EQ) for SecInt(32) at the np_sgn buckets
  * GF(2^8) / GF(2) rounds at the np_aes / sha3 block shapes
  * the np_aes demo itself at -b 64 and -b 2048 (key expansion etc.)

Usage: python tools/warm_caches.py [--quick]
  --quick: only the small buckets (useful in CI; ~2 min on a warm chip)
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
os.environ.setdefault('MPYC_TPU_PARTY_DEVICE', 'tpu')

import numpy as np  # noqa: E402


def log(msg):
    print(f'[warm {time.strftime("%H:%M:%S")}] {msg}', flush=True)


def warm_runtime(quick):
    from mpyc_tpu.runtime import _Options
    from mpyc_tpu.parallel.simulator import SimRuntime

    rt = SimRuntime(3, _Options())
    rt._wire_modules()
    rt.start()
    secint = rt.SecInt(32)
    max_log = 14 if quick else 20
    sizes = [1 << k for k in range(6, max_log + 1)]
    for n in sizes:
        vals = np.arange(n, dtype=np.int64).astype(object)
        A = rt.input(secint.array(vals))[0]
        B = rt.input(secint.array((vals + 1) % 1000))[0]
        t0 = time.time()
        rt.output(rt.np_multiply(A, B))        # mul + reshare bucket
        log(f'mul bucket n={n}: {time.time()-t0:.1f}s')
    for n in sizes:
        vals = ((np.arange(n, dtype=np.int64) % 13) - 6).astype(object)
        X = rt.input(secint.array(vals))[0]
        t0 = time.time()
        rt.output(rt.np_sgn(X, LT=True))
        rt.output(rt.np_sgn(X))
        log(f'sgn buckets n={n}: {time.time()-t0:.1f}s')
    if not quick:
        # SecInt(64)/SecFxp(64:32) fused comparisons (96-bit field, 3
        # uint32 limbs): each bucket is a one-time ~5 min compile through
        # the remote service; seeding here makes the TPU-gated tests
        # (tests/test_sgn_fused.py) and the bench metric run warm
        # one 1024-wide program per mode serves every batch size (larger
        # batches chunk through it, parallel/simulator._np_sgn_fused)
        secint64 = rt.SecInt(64)
        vals = ((np.arange(1024, dtype=np.int64) % 13) - 6).astype(object)
        X = rt.input(secint64.array(vals))[0]
        t0 = time.time()
        rt.output(rt.np_sgn(X, LT=True))
        log(f'secint64 LT bucket: {time.time()-t0:.1f}s')
        t0 = time.time()
        rt.output(rt.np_sgn(X))
        log(f'secint64 sgn bucket: {time.time()-t0:.1f}s')
        # chunked-path programs (tail pad + host-slice upload shapes)
        vals = ((np.arange(2080, dtype=np.int64) % 13) - 6).astype(object)
        X2 = rt.input(secint64.array(vals))[0]
        t0 = time.time()
        rt.output(rt.np_sgn(X2))
        rt.output(rt.np_sgn(X2, LT=True))
        log(f'secint64 chunked shapes: {time.time()-t0:.1f}s')
        secfxp64 = rt.SecFxp(64, 32)
        vals = [float(v) for v in range(-4, 4)]
        X = rt.input(secfxp64.array(np.array(vals)))[0]
        t0 = time.time()
        rt.output(rt.np_less(X, 0))
        log(f'secfxp64:32 less bucket: {time.time()-t0:.1f}s')
    rt.shutdown()


def warm_demo(args):
    t0 = time.time()
    subprocess.run([sys.executable, os.path.join(REPO, 'demos', args[0])]
                   + args[1:], cwd=os.path.join(REPO, 'demos'),
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   timeout=1200)
    log(f'{" ".join(args)}: {time.time()-t0:.1f}s')


def warm_bytecode():
    """Pre-build bytecode caches (see mpyc_tpu.__init__._use_prebuilt_pycache).

    Under PYTHONDONTWRITEBYTECODE=1 every process re-`compile()`s all
    imported sources (~0.3 s/party of numpy + asyncio + this package);
    compileall writes .pyc explicitly, so one pass here makes every later
    process start at cached speed. The package tree is compiled in place
    (normal __pycache__ layout); third-party/stdlib modules go under
    <repo>/.pycache, which mpyc_tpu's import hook activates via
    sys.pycache_prefix when bytecode writing is disabled."""
    import compileall
    import asyncio
    t0 = time.time()
    # single-process: compileall's worker pool would not inherit the
    # in-process sys.pycache_prefix set below
    for tree in (os.path.join(REPO, 'mpyc_tpu'), os.path.join(REPO, 'demos')):
        compileall.compile_dir(tree, quiet=2, workers=1)
    sys.pycache_prefix = os.path.join(REPO, '.pycache')
    # the repo trees again, now under the prefix: once a pycache prefix is
    # active (demo_table.sh exports PYTHONPYCACHEPREFIX; mpyc_tpu/__init__
    # sets sys.pycache_prefix under PYTHONDONTWRITEBYTECODE) CPython only
    # resolves .pyc under the prefix and ignores in-place __pycache__, so
    # the package itself needs prefix-resident bytecode too (the in-place
    # pass above stays useful for prefix-less consumers)
    trees = [os.path.join(REPO, 'mpyc_tpu'), os.path.join(REPO, 'demos'),
             os.path.dirname(np.__file__), os.path.dirname(asyncio.__file__)]
    for heavy in ('sklearn', 'scipy', 'joblib'):  # ridgeregression et al
        try:
            mod = __import__(heavy)
            trees.append(os.path.dirname(mod.__file__))
        except ImportError:
            pass
    if os.path.isdir('/root/reference/mpyc'):
        # benchmark fairness: the read-only reference checkout can't cache
        # its own bytecode; compile it into the shared prefix so
        # tools/demo_table.sh compares protocol speed, not compile() tax
        trees.append('/root/reference/mpyc')
    for tree in trees:
        compileall.compile_dir(tree, quiet=2, workers=1)
    log(f'bytecode caches: {time.time()-t0:.1f}s')


def main():
    quick = '--quick' in sys.argv
    warm_bytecode()
    warm_runtime(quick)
    warm_demo(['np_aes.py', '-M3', '--sim', '-b', '64'])
    if not quick:
        warm_demo(['np_aes.py', '-M3', '--sim', '-b', '2048'])
        warm_demo(['sha3.py', '-M3', '--sim'])
    log('done')


if __name__ == '__main__':
    main()
