"""Build the repo-committed compile-cache seed for the flagship demo path.

Runs `np_aes -M3 --sim -b 64` (and the default secure-mul/comparison
buckets it rides on) under a scratch HOME with a cold cache, so exactly
the artifacts that run needs are produced, then copies them into
`<repo>/.cache_seed/{trace,xla}`.  `mpyc_tpu.enable_compile_cache()`
hard-links the seed into `~/.cache/mpyc_tpu` on first use, so a true-cold
container starts the flagship demo at warm speed (target: np_aes -b 64
<= 30 s nothing-seeded; was ~150 s of remote compiles).

Artifacts are keyed by a salt over {pipelines,keccak,limb}.py + the jax
version + backend (utils/tracecache.py), so the seed must be rebuilt
after editing those files: `python tools/build_cache_seed.py`.

Also prints the measured cold wall time — the honest "true cold start"
number for STATUS.md.
"""
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SEED = os.path.join(REPO, '.cache_seed')


def main():
    scratch = tempfile.mkdtemp(prefix='mpyc-tpu-coldhome-')
    env = dict(os.environ, HOME=scratch, MPYC_TPU_NO_SEED='1',
               MPYC_TPU_PARTY_DEVICE='tpu')
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'demos', 'np_aes.py'),
         '-M3', '--sim', '-b', '64'],
        cwd=os.path.join(REPO, 'demos'), env=env, timeout=1800,
        capture_output=True, text=True)
    cold = time.time() - t0
    print(f'cold np_aes -b 64: {cold:.1f}s (rc={r.returncode})')
    if r.returncode != 0:
        print(r.stderr[-2000:])
        sys.exit(1)
    src_root = os.path.join(scratch, '.cache', 'mpyc_tpu')
    total = 0
    for sub in ('trace', 'xla'):
        src = os.path.join(src_root, sub)
        dst = os.path.join(SEED, sub)
        os.makedirs(dst, exist_ok=True)
        if not os.path.isdir(src):
            continue
        for name in os.listdir(src):
            shutil.copy2(os.path.join(src, name), os.path.join(dst, name))
            total += os.path.getsize(os.path.join(src, name))
        print(f'{sub}: {len(os.listdir(dst))} entries')
    print(f'seed size: {total / 1e6:.1f} MB at {SEED}')
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == '__main__':
    main()
