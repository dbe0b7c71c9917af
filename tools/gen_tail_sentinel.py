#!/usr/bin/env python3
"""Freeze the decane GMBE(1) fragmentation gap (tests/test_gmbe_tail_sentinel.py).

Evaluates E_GMBE(1) and E_unfrag for validation/inputs/overlapping_decane.json
at the currently-installed tables (CPU f64) and writes
tests/data/gmbe_tail_sentinel.json. Regenerating after a deliberate tail-
physics change (e.g. a pair-C6 refit) is the reviewed step that re-arms
the sentinel; see the test module docstring for why.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(REPO, "tests"))

OUT = os.path.join(REPO, "tests", "data", "gmbe_tail_sentinel.json")


def main() -> int:
    from test_gmbe_tail_sentinel import VINPUTS, _energy_from_json

    with open(os.path.join(VINPUTS, "overlapping_decane.json")) as fh:
        data = json.load(fh)
    e_gmbe1 = _energy_from_json(data, VINPUTS)

    unfrag = json.loads(json.dumps(data))
    mol = unfrag["molecules"][0]
    for key in ("fragments", "connectivity", "fragment_charges",
                "fragment_multiplicities"):
        mol.pop(key, None)
    unfrag["keywords"].pop("fragmentation", None)
    e_unfrag = _energy_from_json(unfrag, VINPUTS)

    payload = {
        "e_gmbe1_ha": e_gmbe1,
        "e_unfrag_ha": e_unfrag,
        "gap_ha": e_gmbe1 - e_unfrag,
        "note": "regenerate with tools/gen_tail_sentinel.py; commit the "
                "diff deliberately (tests/test_gmbe_tail_sentinel.py)",
    }
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"wrote {OUT}: gap={payload['gap_ha']:+.9f} Ha "
          f"(GMBE1 {e_gmbe1:.9f}, unfrag {e_unfrag:.9f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
