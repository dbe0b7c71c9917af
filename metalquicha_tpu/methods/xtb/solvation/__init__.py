"""Implicit solvation models for xTB (ALPB / GBSA / CPCM).

Covers the reference's tblite solvation plumbing
(/root/reference/src/methods/mqc_method_xtb.f90:449-671): model selection by
name, solvent lookup (dielectric constants), CDS and solution-state shift
terms. Model implementations land incrementally; `make_solvation_model`
raises for not-yet-implemented models so the driver fails loudly rather
than silently skipping solvation.
"""

from __future__ import annotations

#: solvent -> dielectric constant (ALPB/CPCM lookup; subset of tblite's list)
SOLVENT_DIELECTRICS = {
    "acetone": 20.7,
    "acetonitrile": 37.5,
    "aniline": 6.89,
    "benzaldehyde": 17.85,
    "benzene": 2.27,
    "ch2cl2": 8.93,
    "chcl3": 4.81,
    "cs2": 2.64,
    "dioxane": 2.21,
    "dmf": 37.0,
    "dmso": 46.7,
    "ether": 4.33,
    "ethylacetate": 6.02,
    "furane": 2.94,
    "hexadecane": 2.05,
    "hexane": 1.88,
    "methanol": 32.7,
    "nitromethane": 35.87,
    "octanol": 9.86,
    "woctanol": 8.1,
    "phenol": 12.4,
    "toluene": 2.38,
    "thf": 7.58,
    "water": 80.2,
    "h2o": 80.2,
    "ethanol": 24.5,
}


def dielectric_for(solvent: str, explicit=None) -> float:
    if explicit is not None:
        return float(explicit)
    key = solvent.strip().lower()
    if key not in SOLVENT_DIELECTRICS:
        raise ValueError(f"unknown solvent: {solvent!r}")
    return SOLVENT_DIELECTRICS[key]


def make_solvation_model(xtb_config, variant: str):
    """Instantiate the requested solvation model.

    xtb_config: io.adapter.XtbConfig (solvation_model, solvent, dielectric,
    cpcm settings, use_cds, use_shift).
    """
    model = (xtb_config.solvation_model or "alpb").strip().lower()
    eps = dielectric_for(xtb_config.solvent or "water", xtb_config.dielectric)
    if model in ("alpb", "gbsa"):
        from .born import BornSolvation

        return BornSolvation(
            dielectric=eps,
            alpb=(model == "alpb"),
            variant=variant,
            solvent=(xtb_config.solvent or "water").strip().lower(),
            use_cds=xtb_config.use_cds,
            use_shift=xtb_config.use_shift,
        )
    if model == "cpcm":
        from .cpcm import CpcmSolvation

        return CpcmSolvation(
            dielectric=eps,
            nang=xtb_config.cpcm_nang,
            rscale=xtb_config.cpcm_rscale,
        )
    raise NotImplementedError(f"solvation model {model!r} not implemented")


# ---------------------------------------------------------------------------
# Fitted-parameter auto-load. MUST happen after both submodules are fully
# executed: loading from inside born.py raced the circular born<->cpcm
# import and cpcm's own constant definitions clobbered the loaded values.
# ---------------------------------------------------------------------------
from . import born as _born  # noqa: E402
from . import cpcm as _cpcm  # noqa: E402
import os as _os  # noqa: E402

_SOLV_OVERLAY = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "data", "solv_fitted.json",
)
if _os.path.exists(_SOLV_OVERLAY):
    _born.load_solvation_overlay(_SOLV_OVERLAY)
