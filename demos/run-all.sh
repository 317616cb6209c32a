#!/bin/bash
# Run all demos with the given options, e.g.:
#   ./run-all.sh           (single party)
#   ./run-all.sh -M3       (three local parties over TCP)
#   ./run-all.sh -M3 --sim (three co-located parties, one process)
# Mirrors the reference demos/run-all.sh pattern (extra args pass through).
# Slow demos (cnnmnist, multilateration) are excluded; run them directly.
cd "$(dirname "$0")"
set -e
for demo in helloworld oneliners parallelsort sort secretsanta unanimous \
    indextounitvector ot id3gini aes sha3 onewayhashchains lpsolver \
    lpsolverfxp ridgeregression kmsurvival pseudoinverse \
    elgamal dsa SecretSantaExplained PrefixOrExplained; do
    echo "=== $demo $* ==="
    python "$demo.py" "$@"
done
echo "=== np_bnnmnist --selftest $* ==="
python np_bnnmnist.py --selftest "$@"
echo "All demos passed."
