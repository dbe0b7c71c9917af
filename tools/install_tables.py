#!/usr/bin/env python3
"""Install a fitted GFN1 overlay into the package, stamping the functional
form it was fitted under (globals.klight) so tables and form stay paired.

Usage: python tools/install_tables.py <fitted.json[.ckpt]> --klight {1.0|uniform}

--klight is REQUIRED (ADVICE r4: a default silently unpaired tables fitted
under the uniform-kexp form from the klight form flag). Pass the value the
fit ran under: `--klight 1.0` for a MQC_FORM_VARIANT klight fit, or
`--klight uniform` for a uniform-kexp fit (stores klight=null, i.e. the
engine keeps kexp for light pairs).

Writes metalquicha_tpu/methods/xtb/data/gfn1_fitted.json. Run the full
validation suite afterwards and only COMMIT if the pass count does not
regress.
"""
import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument(
        "--klight", required=True,
        help="form flag the fit ran under: a float (e.g. 1.0) or 'uniform'",
    )
    args = ap.parse_args()
    klight = None if args.klight == "uniform" else float(args.klight)

    with open(args.src) as fh:
        data = json.load(fh)
    data.setdefault("globals", {})["klight"] = klight
    data.pop("residuals", None)
    data.pop("d3_pairs", None)  # dense array duplicate of d3_c6_pairs
    dst = os.path.join(
        REPO, "metalquicha_tpu", "methods", "xtb", "data", "gfn1_fitted.json"
    )
    with open(dst, "w") as fh:
        json.dump(data, fh)
    print(f"installed {args.src} -> {dst} (klight={klight})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
