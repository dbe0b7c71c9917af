"""D3(BJ) dispersion for GFN1-xTB.

CN-interpolated reference C6 coefficients with Becke-Johnson rational
damping (Grimme et al., JCP 132, 154104 (2010); JCC 32, 1456 (2011)).

Reference data status: free-atom and hydride-reference diagonal C6 values
for H/C/N/O are tabulated; CROSS-PAIR reference values currently use the
geometric-mean approximation (marked APPROX) pending the full pair table —
this bounds absolute energy agreement at the ~1e-4 Ha level for H-bonded
clusters and is the dominant remaining parameter gap (see validation notes).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# Reference coordination numbers per element
REF_CN = {
    1: [0.9118, 0.0000],
    6: [0.0000, 0.9868, 1.9985, 2.9987, 3.9844],
    7: [0.0000, 0.9944, 2.0143, 2.9903],
    8: [0.0000, 0.9925, 1.9887],
}

# Diagonal (same element, same reference) C6 values in a.u.
# CALIBRATE: values beyond the free-atom entries are best-effort.
REF_C6_DIAG = {
    1: [3.0267, 7.5916],
    6: [49.1130, 43.2452, 29.3602, 25.7809, 18.2067],
    7: [25.2685, 22.1241, 19.6745, 15.5817],
    8: [15.5059, 12.8161, 10.3708],
}

# sqrt(Z) <r^4>/<r^2> derived factors (dftd3 r2r4 array)
R4R2 = {
    1: 2.00734898,
    6: 3.02617533,
    7: 2.70222770,
    8: 2.59680509,
}

K1 = 16.0  # CN counting steepness
K3 = 4.0   # gaussian weighting exponent

MAX_REFS = 5


@lru_cache(maxsize=None)
def _element_ref_arrays(z: int):
    cns = REF_CN.get(z)
    if cns is None:
        raise NotImplementedError(f"D3 reference data for Z={z} not tabulated")
    c6 = REF_C6_DIAG[z]
    n = len(cns)
    cn_pad = np.full(MAX_REFS, 1.0e6)  # huge CN -> zero weight
    c6_pad = np.zeros(MAX_REFS)
    cn_pad[:n] = cns
    c6_pad[:n] = c6
    return cn_pad, c6_pad, n


def build_d3_tables(numbers: np.ndarray):
    """Host-side per-atom D3 data for a (padded) fragment.

    Returns dict of arrays: ref_cn (nat, R), ref_c6sqrt (nat, R), r4r2 (nat,).
    Padded atoms (z=0) get zero tables.
    """
    nat = len(numbers)
    ref_cn = np.full((nat, MAX_REFS), 1.0e6)
    ref_c6s = np.zeros((nat, MAX_REFS))
    r4r2 = np.zeros(nat)
    for i, z in enumerate(numbers):
        z = int(z)
        if z == 0:
            continue
        cn_pad, c6_pad, n = _element_ref_arrays(z)
        ref_cn[i] = cn_pad
        # APPROX: store sqrt of diagonal C6 so pair reference values are
        # geometric means sqrt(C6_ii) * sqrt(C6_jj)
        ref_c6s[i] = np.sqrt(c6_pad)
        r4r2[i] = R4R2[z]
    return {"ref_cn": ref_cn, "ref_c6sqrt": ref_c6s, "r4r2": r4r2}


def c6_coefficients(cn, ref_cn, ref_c6sqrt):
    """CN-interpolated pairwise C6 (nat, nat) via gaussian weights."""
    # weights per atom/reference
    w = jnp.exp(-K3 * (cn[:, None] - ref_cn) ** 2)  # (nat, R)
    wsum = w.sum(-1, keepdims=True)
    # fallback: when every weight underflows, pick the closest reference
    closest = jnp.argmin(jnp.abs(cn[:, None] - ref_cn), axis=-1)
    onehot = (jnp.arange(ref_cn.shape[1])[None, :] == closest[:, None]).astype(
        cn.dtype
    )
    use_fb = (wsum < 1.0e-30)
    w = jnp.where(use_fb, onehot, w / jnp.where(wsum > 0, wsum, 1.0))
    # effective sqrt(C6) per atom, pair C6 = geometric-mean (APPROX)
    c6s = (w * ref_c6sqrt).sum(-1)  # (nat,)
    return c6s[:, None] * c6s[None, :]


def d3_energy(
    coords, cn, d3tab, atom_mask, s6, s8, a1, a2
):
    """Two-body D3(BJ) energy. `cn` from the shared counting function."""
    nat = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r2 = (diff**2).sum(-1) + jnp.eye(nat)
    r6 = r2**3
    r8 = r2**4

    c6 = c6_coefficients(cn, d3tab["ref_cn"], d3tab["ref_c6sqrt"])
    qq = 3.0 * d3tab["r4r2"][:, None] * d3tab["r4r2"][None, :]
    c8 = c6 * qq

    r0 = jnp.sqrt(jnp.where(c6 > 0, qq, 1.0))
    damp = a1 * r0 + a2
    e = s6 * c6 / (r6 + damp**6) + s8 * c8 / (r8 + damp**8)

    pair_mask = atom_mask[:, None] * atom_mask[None, :] * (1.0 - jnp.eye(nat))
    pair_mask = pair_mask * (r2 > 1e-10)  # skip coincident pairs (GMBE caps)
    return -0.5 * (e * pair_mask).sum()
