#!/usr/bin/env python3
"""Quantify the TPU f32 production-path accuracy gap (VERDICT r2 item 7).

Runs the validation suite twice — CPU f64 (the parity path) and TPU f32
(the production path) — and writes TPU_ACCURACY.json + TPU_ACCURACY.md
recording, per case, the f32-TPU deviation from both the reference
expected values and the f64-CPU results.

Usage:
    python tools/tpu_accuracy.py                  # run both + report
    python tools/tpu_accuracy.py --cpu-json A.json --tpu-json B.json
                                                  # just compare existing runs

The two runs happen in SUBPROCESSES because jax platform/x64 flags are
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


def _run(platform: str, f32: bool, out: str, skip_slow: bool) -> None:
    cmd = [sys.executable, VAL, "--platform", platform, "--json-out", out]
    if f32:
        cmd.append("--f32")
    if skip_slow:
        cmd.append("--skip-slow")
    env = dict(os.environ)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)


def _values(case: dict) -> dict:
    """Flatten a case's checks to {observable_label: got_value}."""
    return {
        chk["label"]: float(chk["got"])
        for chk in case.get("checks", [])
        if isinstance(chk.get("got"), (int, float))
    }


def compare(cpu_json: str, tpu_json: str):
    with open(cpu_json) as fh:
        cpu = {c["name"]: c for c in json.load(fh)["cases"]}
    with open(tpu_json) as fh:
        tpu = {c["name"]: c for c in json.load(fh)["cases"]}

    rows = []
    for name, ctpu in tpu.items():
        ccpu = cpu.get(name)
        if ccpu is None:
            continue
        vc = _values(ccpu)
        vt = _values(ctpu)
        worst = 0.0
        worst_obs = None
        for obs, v64 in vc.items():
            if obs in vt:
                d = abs(vt[obs] - v64)
                if d > worst:
                    worst, worst_obs = d, obs
        rows.append({
            "case": name,
            "f32_vs_f64": worst,
            "worst_observable": worst_obs,
            "cpu_status": ccpu.get("status"),
            "tpu_status": ctpu.get("status"),
            "cpu_vs_expected": ccpu.get("worst_delta"),
            "tpu_vs_expected": ctpu.get("worst_delta"),
        })
    rows.sort(key=lambda r: -(r["f32_vs_f64"] or 0.0))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-json", default=None)
    ap.add_argument("--tpu-json", default=None)
    ap.add_argument("--skip-slow", action="store_true")
    ap.add_argument("--out-prefix", default=os.path.join(REPO, "TPU_ACCURACY"))
    args = ap.parse_args()

    cpu_json = args.cpu_json or "/tmp/val_cpu_f64.json"
    tpu_json = args.tpu_json or "/tmp/val_tpu_f32.json"
    if args.cpu_json is None:
        _run("cpu", False, cpu_json, args.skip_slow)
    if args.tpu_json is None:
        _run("axon", True, tpu_json, args.skip_slow)

    rows = compare(cpu_json, tpu_json)
    with open(args.out_prefix + ".json", "w") as fh:
        json.dump({"cases": rows}, fh, indent=1)

    lines = [
        "# TPU f32 production-path accuracy",
        "",
        "Per-validation-case deviation of the TPU float32 production path",
        "from the CPU float64 parity path (worst observable per case).",
        "f64 `linalg.solve` is unsupported on this TPU, so f32 (with",
        "`jax_default_matmul_precision=highest`) IS the production",
        "precision; this table is what a TPU user actually gets.",
        "",
        "| case | worst f32-vs-f64 | observable | f64 vs expected | "
        "f32 vs expected |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        c64 = r.get("cpu_vs_expected")
        c32 = r.get("tpu_vs_expected")
        lines.append(
            f"| {r['case']} | {r['f32_vs_f64']:.3e} | "
            f"{r['worst_observable']} | "
            + (f"{c64:.2e}" if c64 is not None else "n/a") + " | "
            + (f"{c32:.2e}" if c32 is not None else "n/a") + " |"
        )
    with open(args.out_prefix + ".md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out_prefix}.json / .md ({len(rows)} cases)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
