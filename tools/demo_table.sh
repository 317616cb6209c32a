#!/bin/bash
# Honest same-host wall-clock comparison: every common demo at -M3,
# this framework (per-party scalar plane) vs the reference
# (/root/reference), in a CLEAN environment: PYTHONPATH is stripped for
# both sides, so neither pays this container's jax sitecustomize preload
# (~2 s/process) — the repo's scalar plane is jax-free (utils/lazyjax.py)
# and the reference never imports jax, so this matches what a user's
# machine would measure. The reference gets /root/reference on its path
# (its package location), nothing else.
# Both sides read the prebuilt bytecode cache (tools/warm_caches.py):
# this container exports PYTHONDONTWRITEBYTECODE=1, which otherwise makes
# every process re-compile() all imported sources (~0.3 s/party of numpy
# + asyncio); a normal machine caches bytecode on first run, so reading a
# prebuilt cache is what a user's second run would measure anyway.
# Usage: tools/demo_table.sh [out.tsv]
export PYTHONPYCACHEPREFIX=/root/repo/.pycache
OUT=${1:-/tmp/demo_table.tsv}
: > "$OUT"
DEMOS="helloworld oneliners parallelsort sort secretsanta unanimous \
  indextounitvector ot id3gini aes sha3 onewayhashchains lpsolver \
  lpsolverfxp ridgeregression kmsurvival pseudoinverse np_id3gini \
  np_lpsolver np_lpsolverfxp np_kmsurvival np_onewayhashchains"
for d in $DEMOS; do
    t0=$(date +%s.%N)
    (cd /root/repo/demos && PYTHONPATH= \
        timeout 300 python "$d.py" -M3 >/dev/null 2>&1)
    rc1=$?
    t1=$(date +%s.%N)
    (cd /root/reference/demos && PYTHONPATH=/root/reference \
        timeout 300 python "$d.py" -M3 >/dev/null 2>&1)
    rc2=$?
    t2=$(date +%s.%N)
    ours=$(echo "$t1 $t0" | awk '{printf "%.2f", $1-$2}')
    ref=$(echo "$t2 $t1" | awk '{printf "%.2f", $1-$2}')
    [ $rc1 -ne 0 ] && ours="FAIL($rc1)"
    [ $rc2 -ne 0 ] && ref="FAIL($rc2)"
    echo -e "$d\t$ours\t$ref" | tee -a "$OUT"
done
