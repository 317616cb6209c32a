#!/bin/bash
# Run all np_* (array-vectorized) demos with the given options, e.g.:
#   ./np-run-all.sh           (single party)
#   ./np-run-all.sh -M3       (three local parties over TCP)
#   ./np-run-all.sh -M3 --sim (three co-located parties, one process)
# Mirrors the reference demos/np-run-all.sh pattern (extra args pass
# through).  Slow demos (np_cnnmnist) are excluded; run them directly.
cd "$(dirname "$0")"
set -e
for demo in np_aes np_id3gini np_kmsurvival np_lpsolver \
    np_lpsolverfxp np_onewayhashchains; do
    echo "=== $demo $* ==="
    python "$demo.py" "$@"
done
echo "=== np_bnnmnist --selftest $* ==="
python np_bnnmnist.py --selftest "$@"
echo "All np demos passed."
