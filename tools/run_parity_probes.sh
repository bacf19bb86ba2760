#!/bin/sh
# One-command completion of the accuracy-parity probe matrix
# (VERDICT r4 item 3): main 3x5xseeds matrix (cached cells reused),
# capacity pass, annotation-noise probe (all 5 ops x 3 seeds), and the
# budget tail (384/768-epoch cells). Resumable: PARITY_RUNS.json is
# rewritten after every cell, so a killed run loses at most one cell.
cd "$(dirname "$0")/.." || exit 1
exec python parity_runs.py --noise-probe --budget "$@"
