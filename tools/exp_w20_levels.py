#!/usr/bin/env python3
"""Decompose the w20 MBE(4) residual (-2.04e-3 Ha, parameter-invariant).

Runs the w20_isomer validation case on CPU f64 and prints:
  - per-level interaction sums (sum_by_level),
  - cumulative MBE(k) totals vs the reference expected value,
  - the unfragmented total (our model's own convergence limit),
  - pair interaction deltas vs min O-O distance (the tail profile).

The stage-B LM fit drove every absolute-energy anchor to 1e-9..1e-10 while
w20 stayed at -2.041e-3 (log /tmp/fit_r5w.log): an interaction-dominated
observable with a near-null parameter Jacobian. This experiment localizes
WHERE in the expansion the model-form error lives (reference value:
validation/expected.json w20_mbe = -115.6850246841, computed by the
reference's bottom-up delta assembly, mqc_mbe.f90:587-760, with NO
distance screening — the input has no %cutoffs and the reference skips
screening when fragment_cutoffs is unallocated, mqc_frag_utils.f90:85).
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

EXPECTED = -115.6850246841


def main() -> int:
    from metalquicha_tpu.compile_cache import enable as enable_cache
    enable_cache()
    from metalquicha_tpu.driver import run_calculation
    from metalquicha_tpu.io.config import parse_mqc_string
    from metalquicha_tpu.io.prep import emit_mqc

    inp = os.path.join(REPO, "validation", "inputs", "w20_isomer.json")
    with open(inp) as fh:
        data = json.load(fh)

    max_level = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    data["keywords"]["fragmentation"]["level"] = max_level

    cfg = parse_mqc_string(emit_mqc(data, base_dir=os.path.dirname(inp)))
    out = run_calculation(cfg, input_path=inp, write_json=False)[""]
    res = out.result

    print(f"max_level={max_level}")
    print(f"total            {res.total_energy:.10f}")
    print(f"expected (MBE4)  {EXPECTED:.10f}")
    print(f"residual         {res.total_energy - EXPECTED:+.3e}")
    if res.sum_by_level is not None:
        cum = 0.0
        for lvl, s in enumerate(res.sum_by_level, start=1):
            cum += s
            print(f"  level {lvl}: sum={s:+.8f}  cumulative={cum:.10f}"
                  f"  resid_vs_exp={cum - EXPECTED:+.3e}")

    # pair tail profile: delta energies of the 190 dimers vs min O-O dist
    polymers = out.polymers
    if polymers is not None and res.delta_energies is not None:
        levels = (polymers >= 0).sum(axis=1)
        sel = np.nonzero(levels == 2)[0]
        # recover monomer O positions from the input xyz
        import re
        xyz_path = os.path.join(os.path.dirname(inp),
                                data["molecules"][0]["xyz"])
        coords, syms = [], []
        with open(xyz_path) as fh:
            lines = fh.read().split("\n")
        for ln in lines[2:]:
            p = ln.split()
            if len(p) >= 4:
                syms.append(p[0])
                coords.append([float(x) for x in p[1:4]])
        coords = np.asarray(coords)
        frags = data["molecules"][0]["fragments"]
        rows = []
        for i in sel:
            a, b = int(polymers[i, 0]), int(polymers[i, 1])
            ia, ib = frags[a], frags[b]
            d = np.linalg.norm(
                coords[ia][:, None, :] - coords[ib][None, :, :], axis=-1
            ).min()
            rows.append((d, float(res.delta_energies[i]), a, b))
        rows.sort()
        print("\npair deltas vs min interatomic distance (Angstrom, Ha):")
        for d, de, a, b in rows:
            print(f"  {d:7.3f}  {de:+.8e}   ({a:2d},{b:2d})")
        tail = sum(de for d, de, _, _ in rows if d > 4.0)
        print(f"\nsum of pair deltas with min dist > 4 A: {tail:+.6e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
