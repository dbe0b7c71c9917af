#!/bin/bash
# Round-5 table install pipeline (STATUS.md "In flight" step, scripted so the
# order is reproducible). Run from the repo root after a stage fit finishes:
#
#   bash tools/round5_install.sh tools/fitted_gfn1_r5g2.json[.ckpt]
#
# Steps: install GFN1 overlay (klight form) -> recalibrate solvation on the
# new gas-phase energies -> regenerate the self-referential fixtures that
# pin parameter state (element anchors, GMBE tail sentinel) -> full f64
# validation suite -> unit tests. Commit tables + RESULTS together only if
# the pass count does not regress.
set -euo pipefail
SRC="${1:?usage: round5_install.sh <fitted.json[.ckpt]>}"
cd "$(dirname "$0")/.."

python tools/install_tables.py "$SRC" --klight 1.0

cp tools/fitted_solv_r5w.json tools/fitted_solv_r5g.json 2>/dev/null || true
python tools/fit_solvation.py --iters 40 --out tools/fitted_solv_r5g.json
cp tools/fitted_solv_r5g.json metalquicha_tpu/methods/xtb/data/solv_fitted.json

python tools/gen_element_fixtures.py
python tools/gen_tail_sentinel.py

python validation/run_validation.py --json-out validation/RESULTS_round5.json
python -m pytest tests/ -q
