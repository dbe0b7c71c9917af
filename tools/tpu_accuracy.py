#!/usr/bin/env python3
"""Quantify TPU production-path accuracy (VERDICT r2 item 7 / r4 item 4).

Runs the validation suite three ways and writes TPU_ACCURACY.json +
TPU_ACCURACY.md:

1. CPU f64           — the parity path (the committed scoreboard).
2. TPU f32 raw       — device precision with the polish DISABLED
                       (--f32 --polish off): the error envelope the f64
                       host polish exists to close.
3. TPU production    — what a TPU user actually gets by default: f32
                       device SCC + automatic f64 host polish of the
                       variational functional at the converged charges
                       (methods/xtb/polish.py).

The headline table is leg 3 vs leg 1; leg 2 is recorded alongside so the
polish's effect is auditable in one artifact.

Usage:
    python tools/tpu_accuracy.py [--skip-slow]
    python tools/tpu_accuracy.py --cpu-json A.json --raw-json B.json \
        --prod-json C.json     # just compare existing runs

The runs happen in SUBPROCESSES because jax platform/x64 flags are
process-global (CLAUDE.md: the axon plugin ignores JAX_PLATFORMS=cpu
overrides mid-process).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
VAL = os.path.join(REPO, "validation", "run_validation.py")


def _run(out: str, skip_slow: bool, *flags: str, check: bool = True) -> None:
    cmd = [sys.executable, VAL, "--json-out", out, *flags]
    if skip_slow:
        cmd.append("--skip-slow")
    # check=False legs (the raw-f32 envelope) are EXPECTED to fail cases —
    # the runner exits nonzero then, but still writes the JSON we consume.
    proc = subprocess.run(cmd, check=False, env=dict(os.environ), cwd=REPO)
    if check and proc.returncode != 0:
        raise SystemExit(
            f"validation leg {flags} failed (rc={proc.returncode})"
        )
    if not os.path.exists(out):
        raise SystemExit(f"validation leg {flags} wrote no JSON ({out})")


def _values(case: dict) -> dict:
    """Flatten a case's checks to {observable_label: got_value}."""
    return {
        chk["label"]: float(chk["got"])
        for chk in case.get("checks", [])
        if isinstance(chk.get("got"), (int, float))
    }


def _worst_vs(base_case: dict, other_case: dict):
    vb, vo = _values(base_case), _values(other_case)
    worst, worst_obs = 0.0, None
    for obs, v in vb.items():
        if obs in vo:
            d = abs(vo[obs] - v)
            if d > worst:
                worst, worst_obs = d, obs
    return worst, worst_obs


def compare(cpu_json: str, raw_json: str, prod_json: str):
    with open(cpu_json) as fh:
        cpu = {c["name"]: c for c in json.load(fh)["cases"]}
    with open(raw_json) as fh:
        raw = {c["name"]: c for c in json.load(fh)["cases"]}
    with open(prod_json) as fh:
        prod = {c["name"]: c for c in json.load(fh)["cases"]}

    rows = []
    for name, cprod in prod.items():
        ccpu = cpu.get(name)
        if ccpu is None:
            continue
        d_prod, obs_prod = _worst_vs(ccpu, cprod)
        craw = raw.get(name)
        d_raw, _ = _worst_vs(ccpu, craw) if craw else (None, None)
        rows.append({
            "case": name,
            "production_vs_f64": d_prod,
            "worst_observable": obs_prod,
            "raw_f32_vs_f64": d_raw,
            "cpu_status": ccpu.get("status"),
            "production_status": cprod.get("status"),
            "cpu_vs_expected": ccpu.get("worst_delta"),
            "production_vs_expected": cprod.get("worst_delta"),
        })
    rows.sort(key=lambda r: -(r["production_vs_f64"] or 0.0))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-json", default=None)
    ap.add_argument("--raw-json", default=None)
    ap.add_argument("--prod-json", default=None)
    ap.add_argument("--skip-slow", action="store_true")
    ap.add_argument("--out-prefix", default=os.path.join(REPO, "TPU_ACCURACY"))
    args = ap.parse_args()

    cpu_json = args.cpu_json or "/tmp/val_cpu_f64.json"
    raw_json = args.raw_json or "/tmp/val_tpu_f32_raw.json"
    prod_json = args.prod_json or "/tmp/val_tpu_prod.json"
    if args.cpu_json is None:
        _run(cpu_json, args.skip_slow, "--platform", "cpu")
    if args.raw_json is None:
        _run(raw_json, args.skip_slow,
             "--platform", "axon", "--f32", "--polish", "off", check=False)
    if args.prod_json is None:
        _run(prod_json, args.skip_slow, "--platform", "axon")

    rows = compare(cpu_json, raw_json, prod_json)
    with open(args.out_prefix + ".json", "w") as fh:
        json.dump({"cases": rows}, fh, indent=1)

    lines = [
        "# TPU production-path accuracy",
        "",
        "Per-validation-case deviation of the TPU production path (f32",
        "device SCC + automatic f64 host polish, the driver default on",
        "accelerators — `methods/xtb/polish.py`) from the CPU float64",
        "parity path, worst observable per case. The raw-f32 column is",
        "the same device run with the polish disabled (`--f32 --polish",
        "off`): the envelope the polish closes. f64 `linalg.solve` is",
        "unsupported on this TPU, so f32+polish IS the production",
        "precision; the production column is what a TPU user gets.",
        "",
        "| case | production vs f64 | observable | raw f32 vs f64 | "
        "f64 vs expected | production vs expected |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        draw = r.get("raw_f32_vs_f64")
        c64 = r.get("cpu_vs_expected")
        cpr = r.get("production_vs_expected")
        lines.append(
            f"| {r['case']} | {r['production_vs_f64']:.3e} | "
            f"{r['worst_observable']} | "
            + (f"{draw:.3e}" if draw is not None else "n/a") + " | "
            + (f"{c64:.2e}" if c64 is not None else "n/a") + " | "
            + (f"{cpr:.2e}" if cpr is not None else "n/a") + " |"
        )
    with open(args.out_prefix + ".md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out_prefix}.json / .md ({len(rows)} cases)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
