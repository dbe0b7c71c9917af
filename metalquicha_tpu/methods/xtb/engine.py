"""Batched GFN-xTB engine: H0 + SCC in JAX.

One fragment = one dense padded problem; `vmap` supplies the batch axis and
the mesh executor shards it. Everything is static-shape, scan-based, and
differentiable.

Gradient strategy (replaces tblite's hand-coded analytic gradients,
/root/reference/src/methods/mqc_method_xtb.f90:252-296): the SCC total energy
is evaluated through a variational functional

    E(R; q*, f*) = sum_i f*_i eps_i(R, q*) + sum_sh v_sh(q*, R) n*_sh
                   + E_coul(q*, R) + E_rep(R) + E_disp(R) - T S_el*

which is stationary in the converged shell charges q* and occupations f*.
`jax.grad` w.r.t. R with q*/f* stop-gradient'ed therefore yields the exact
analytic gradient — including Pulay and CN-chain terms — while only
eigenvalue derivatives of `eigh` are exercised (degeneracy-safe).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...constants import KB_HARTREE
from .overlap import overlap_matrix
from .batch import PAD_LEVEL

#: largest AO dimension handled by the Pallas Jacobi in-loop eigensolver
#: ((N, N, 128) x3 VMEM tiles; N=96 exceeds VMEM). Above it the f32 TPU
#: path switches to SP2 purification (ops/sp2.py). Module-level so tests
#: can lower it to exercise the SP2 path on small molecules.
PALLAS_EIGH_MAX_N = 64


class EngineSettings(NamedTuple):
    """Static engine knobs (hashable; part of the jit cache key)."""

    max_scf_iter: int = 32
    #: SCC early-exit residual tolerance. The SCC loops are while_loops
    #: bounded by max_scf_iter that ALSO stop once the charge residual
    #: drops below this value — the reference's tblite behavior (iterate
    #: to tolerance, not to the iteration budget). 0.0 = never exit early
    #: (fixed-iteration semantics; what fits/benches use for strict
    #: run-to-run comparability). Safe to set because the loops are never
    #: differentiated (q* is stop-gradient'ed into the variational
    #: functional).
    scf_tol: float = 0.0
    electronic_temp: float = 300.0  # Kelvin
    mixer_damping: float = 0.4
    broyden_memory: int = 12
    include_entropy: bool = True
    kpol: float = 2.85
    ken: float = -0.007
    kcn_steep: float = 16.0
    kexp_rep: float = 1.5
    rexp_rep: float = 1.0
    #: reduced repulsion distance exponent for light-light (Z<=2) pairs —
    #: the klight rule (published 1.0 for BOTH GFN1 and GFN2; Bannwarth et
    #: al. JCTC 2019 eq. 7). None = uniform kexp (legacy overlay form).
    klight_rep: float = None
    gexp: float = 2.0
    kll: tuple = ((1.85, 2.08, 2.00), (2.08, 2.25, 2.00), (2.00, 2.00, 2.00))
    third_order: bool = True
    fixed_occupations: bool = False
    disp_s6: float = 1.0
    disp_s8: float = 2.4
    disp_a1: float = 0.63
    disp_a2: float = 5.0
    #: ATM three-body dispersion (dispersion_d3.atm_energy). s9 = 0 keeps
    #: the two-body-only form; a STATIC gate — the traced values ride
    #: FragmentData.glb[16]/glb[17] so the parameter fit differentiates
    #: through them. Tables and s9 travel together (overlay globals).
    disp_s9: float = 0.0
    disp_rs9: float = 0.65
    # --- discrete functional-form variants (tblite-convention candidates,
    # selected empirically against the reference validation set) ---
    #: K rule for pairs involving a polarization shell:
    #: "flat" K=kpol; "avg" K=0.5*(k_l + kpol); suffix "_noen" skips the
    #: electronegativity factor on such pairs
    kpol_mode: str = "flat"
    #: shell-hardness average in the second-order kernel
    eta_average: str = "harmonic"  # or "arithmetic"
    #: CN counting function for the H0 self-energy shifts: "exp" (single
    #: exponential) or "gfn" (double-exponential product, tblite ncoord gfn
    #: type — the xTB hamiltonian CN with a second long-range switch)
    cn_type: str = "exp"
    #: CN counting function for D3 dispersion C6 interpolation. tblite's
    #: d3 container uses the classic single-exponential D3 CN regardless of
    #: the hamiltonian CN type, so these are INDEPENDENT knobs.
    cn_type_d3: str = "exp"
    #: use the fast in-loop SCC solvers on the TPU f32 path: the Pallas
    #: batched Jacobi eigensolver for AO dims <= 64 (~3.4x faster than
    #: XLA's eigh there) and SP2 density purification (ops/sp2.py, pure
    #: MXU matmuls) for larger AO dims where the Jacobi kernel exceeds
    #: VMEM. The final variational energy evaluation always uses jnp eigh.
    use_pallas_eigh: bool = False
    #: GFN2 mode: self-consistent atomic dipoles/quadrupoles (AES) and
    #: charge-scaled (D4-style) dispersion inside the SCC
    multipoles: bool = False


def settings_from_params(variant: str = "gfn1", **overrides) -> "EngineSettings":
    """Build EngineSettings from a parameter module's GlobalParams."""
    if variant == "gfn2":
        from . import params_gfn2 as params
    else:
        from . import params_gfn1 as params
    g = params.GLOBALS
    base = dict(
        kpol=g.kpol,
        ken=g.ken,
        kcn_steep=g.kcn_exp,
        kexp_rep=g.kexp,
        rexp_rep=g.rexp,
        klight_rep=getattr(g, "klight", None),
        gexp=g.gexp,
        kll=(
            (g.kss, g.ksp, g.ksd),
            (g.ksp, g.kpp, g.kpd),
            (g.ksd, g.kpd, g.kdd),
        ),
        disp_s6=g.disp_s6,
        disp_s8=g.disp_s8,
        disp_a1=g.disp_a1,
        disp_a2=g.disp_a2,
        disp_s9=getattr(g, "disp_s9", 0.0),
        disp_rs9=getattr(g, "disp_rs9", 0.65),
        multipoles=bool(getattr(g, "multipoles", False)),
        eta_average=getattr(g, "eta_average", "harmonic"),
        cn_type=getattr(g, "cn_type", "exp"),
        cn_type_d3=getattr(g, "cn_type_d3", "exp"),
        kpol_mode=getattr(g, "kpol_mode", "flat"),
    )
    base.update(overrides)
    import json as _json
    import os as _os

    env = _os.environ.get("MQC_FORM_VARIANT")
    if env:
        # fitting-tool escape hatch: overrides functional-form selection for
        # every engine in this process. Warn loudly so a stale env var can
        # never silently change production energies.
        import warnings as _warnings

        _warnings.warn(
            f"MQC_FORM_VARIANT active — engine form overridden by {env}",
            stacklevel=2,
        )
        base.update(_json.loads(env))
    return EngineSettings(**base)


# ---------------------------------------------------------------------------
# Geometry-dependent ingredients
# ---------------------------------------------------------------------------


def coordination_numbers(coords, rcov, atom_mask, steepness, cn_type="exp",
                         cutoff=25.0):
    """Exponential counting function CN (GFN1/D3 style, k2 = 4/3).

    The real-space `cutoff` (Bohr) matters for SIZE CONSISTENCY: the
    exponential counting function tends to 1/(1+e^k) ~ 1.1e-7 per pair as
    r -> inf, NOT to zero, so without a cutoff every far pair in a cluster
    inflates the CN — a cluster-size-dependent accumulation (~6e-6 CN/atom
    in a 20-water cluster) that breaks E(A...B) = E(A)+E(B) at the 1e-8
    level and skews CN-coupled self-energies in large systems.  tblite
    evaluates its ncoord counting functions under a real-space cutoff
    (default 25 Bohr), which the reference inherits; we match it."""
    diff = coords[:, None, :] - coords[None, :, :]
    # clamp before sqrt: coincident pairs (GMBE caps) otherwise produce
    # inf * 0 = NaN in the backward pass
    r = jnp.sqrt(
        jnp.maximum((diff**2).sum(-1), 1e-12) + jnp.eye(coords.shape[0], dtype=coords.dtype)
    )
    r0 = (4.0 / 3.0) * (rcov[:, None] + rcov[None, :])
    cf = 1.0 / (1.0 + jnp.exp(-steepness * (r0 / r - 1.0)))
    if cn_type == "gfn":
        # double-exponential counting (tblite ncoord "gfn"): a second,
        # steeper switch at a shifted radius sharpens the plateau
        cf = cf / (1.0 + jnp.exp(-2.0 * steepness * ((r0 + 2.0) / r - 1.0)))
    pair_mask = atom_mask[:, None] * atom_mask[None, :]
    pair_mask = pair_mask * (1.0 - jnp.eye(coords.shape[0], dtype=coords.dtype))
    pair_mask = pair_mask * (r > 1e-5)  # skip coincident pairs (GMBE caps)
    pair_mask = pair_mask * (r < cutoff)
    return (cf * pair_mask).sum(-1)


def pair_distances(coords):
    diff = coords[:, None, :] - coords[None, :, :]
    # clamped sqrt: keeps gradients finite at coincident pairs (GMBE caps)
    return jnp.sqrt(
        jnp.maximum((diff**2).sum(-1), 1e-12) + jnp.eye(coords.shape[0], dtype=coords.dtype)
    )


def repulsion_energy(coords, zeff, alpha, atom_mask, kexp, rexp,
                     light_mask=None, klight=None):
    """E_rep = sum_{A<B} ZA ZB / R^rexp * exp(-sqrt(aA aB) R^k_AB).

    BOTH published GFN parameterizations use a REDUCED distance exponent
    for pairs of light elements (H/He): k_AB = klight (published 1.0) when
    both atoms have Z <= 2, kexp (1.5) otherwise — the tblite repulsion
    "klight" rule (GFN1: Grimme et al. JCTC 2017 eq. 9; GFN2: Bannwarth et
    al. JCTC 2019 eq. 7, k_f = 1 for H/He pairs). At geminal H..H
    distances (~3.3 Bohr) the two forms differ by ~400x (2.6e-4 vs
    5.5e-7 Ha per pair), which no smooth alpha/Zeff refit can mimic across
    the whole distance range. klight=None keeps the uniform-kexp form —
    a TABLE-PAIRING flag, not physics: tables fitted under the uniform
    form must keep it until refitted (globals.klight in the overlay).

    Coincident pairs (r ~ 0, e.g. stacked GMBE caps) are skipped, matching
    the tblite kernels' r ~ 0 guard."""
    n = coords.shape[0]
    r = pair_distances(coords)
    pair_mask = atom_mask[:, None] * atom_mask[None, :] * (1.0 - jnp.eye(n, dtype=coords.dtype))
    pair_mask = pair_mask * (r > 1e-5)
    r = jnp.maximum(r, 1e-5)  # masked pairs must stay finite (0*inf = NaN)
    zz = zeff[:, None] * zeff[None, :]
    ab = jnp.sqrt(alpha[:, None] * alpha[None, :])
    if klight is not None and light_mask is not None:
        light_pair = light_mask[:, None] * light_mask[None, :]
        k_ab = kexp + (klight - kexp) * light_pair
    else:
        k_ab = kexp
    e = zz / r**rexp * jnp.exp(-ab * r**k_ab)
    return 0.5 * (e * pair_mask).sum()


def h0_matrix(S, coords, batch, cn, settings: EngineSettings):
    """Extended-Hueckel core Hamiltonian (GFN1 form)."""
    sh_level = batch.sh_level - batch.sh_kcn * cn[batch.sh_atom]
    ao_level = sh_level[batch.ao_shell]                     # (nao,)
    ao_l = batch.sh_l[batch.ao_shell]
    ao_pol = batch.sh_pol[batch.ao_shell]
    ao_poly = batch.sh_poly[batch.ao_shell]
    ao_en = batch.at_en[batch.ao_atom]
    ao_rad = batch.at_rad[batch.ao_atom]

    # global constants ride batch.glb (traced -> differentiable in fits);
    # GLB_FIELDS order: kss ksp ksd kpp kpd kdd kpol ken kexp rexp gexp kcn
    glb = batch.glb
    kll = jnp.stack([
        jnp.stack([glb[0], glb[1], glb[2]]),
        jnp.stack([glb[1], glb[3], glb[4]]),
        jnp.stack([glb[2], glb[4], glb[5]]),
    ])
    kpol = glb[6]
    ken = glb[7]
    K = kll[ao_l[:, None], ao_l[None, :]]
    pol_pair = (ao_pol[:, None] + ao_pol[None, :]) > 0.5
    if settings.kpol_mode.startswith("avg"):
        kdiag = jnp.stack([glb[0], glb[3], glb[5]])
        k_self = kdiag[ao_l]
        k_mix = 0.5 * (k_self[:, None] + kpol)
        k_mix_t = 0.5 * (kpol + k_self[None, :])
        one_pol = pol_pair & ~(
            (ao_pol[:, None] > 0.5) & (ao_pol[None, :] > 0.5)
        )
        both_pol = (ao_pol[:, None] > 0.5) & (ao_pol[None, :] > 0.5)
        K = jnp.where(
            one_pol,
            jnp.where(ao_pol[:, None] > 0.5, k_mix_t, k_mix),
            K,
        )
        K = jnp.where(both_pol, kpol, K)
    else:
        K = jnp.where(pol_pair, kpol, K)

    en_fac = 1.0 + ken * (ao_en[:, None] - ao_en[None, :]) ** 2
    if settings.kpol_mode.endswith("_noen"):
        en_fac = jnp.where(pol_pair, 1.0, en_fac)

    r_at = pair_distances(coords)
    r_ao = r_at[batch.ao_atom[:, None], batch.ao_atom[None, :]]
    r0 = ao_rad[:, None] + ao_rad[None, :]
    rr = jnp.sqrt(r_ao / r0)
    pi_fac = (1.0 + ao_poly[:, None] * rr) * (1.0 + ao_poly[None, :] * rr)

    havg = 0.5 * (ao_level[:, None] + ao_level[None, :])
    # element-pair scaling K_AB (tblite gfn1 kpair analog; 1.0 by default)
    kp_ao = batch.at_kpair[batch.ao_atom[:, None], batch.ao_atom[None, :]]
    H = K * kp_ao * havg * S * en_fac * pi_fac

    same_atom = batch.ao_atom[:, None] == batch.ao_atom[None, :]
    H = jnp.where(same_atom, 0.0, H)
    # padded AOs get DISTINCT high levels: exact degeneracy would NaN the
    # eigenvector backward pass (1/(eps_i - eps_j)) in differentiable-SCF
    nao = batch.ao_mask.shape[0]
    pad_levels = PAD_LEVEL + 0.1 * jnp.arange(nao, dtype=H.dtype)
    diag = jnp.where(batch.ao_mask > 0.5, ao_level, pad_levels)
    H = H + jnp.diag(diag)
    return H


def gamma_matrix(coords, batch, settings: EngineSettings):
    """Shell-resolved second-order Coulomb kernel (MNOK, harmonic avg)."""
    r_at = pair_distances(coords) * (1.0 - jnp.eye(coords.shape[0], dtype=coords.dtype))
    r_sh = r_at[batch.sh_atom[:, None], batch.sh_atom[None, :]]
    eta_i = batch.sh_eta[:, None]
    eta_j = batch.sh_eta[None, :]
    g = batch.glb[10]
    if settings.eta_average == "arithmetic":
        eta_avg = 0.5 * (eta_i + eta_j)
    elif settings.eta_average == "geometric":
        eta_avg = jnp.sqrt(eta_i * eta_j)
    elif settings.eta_average == "invpow":
        # average the kernel-space eta^{-g} values directly
        eta_avg = (0.5 * (eta_i ** (-g) + eta_j ** (-g))) ** (-1.0 / g)
    else:
        eta_avg = 2.0 * eta_i * eta_j / (eta_i + eta_j)
    return (r_sh**g + eta_avg ** (-g)) ** (-1.0 / g)


# ---------------------------------------------------------------------------
# Occupations
# ---------------------------------------------------------------------------


def _fermi_fill(eps, n_el, kt, ao_mask):
    """Fermi occupations (one spin channel, occupancy in [0,1]) + entropy."""
    big = 1.0e3
    e = jnp.where(ao_mask > 0.5, eps, big)

    def occ(mu):
        x = jnp.clip((e - mu) / kt, -60.0, 60.0)
        return 1.0 / (1.0 + jnp.exp(x))

    lo = e.min() - 10.0
    hi = jnp.where(ao_mask > 0.5, e, -big).max() + 10.0

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        n = occ(mid).sum()
        too_many = n > n_el
        return (jnp.where(too_many, lo, mid), jnp.where(too_many, mid, hi))

    lo, hi = jax.lax.fori_loop(0, 80, body, (lo, hi))
    f = occ(0.5 * (lo + hi))
    fc = jnp.clip(f, 1.0e-30, 1.0 - 1.0e-30)
    entropy = -(fc * jnp.log(fc) + (1 - fc) * jnp.log(1 - fc))
    entropy = jnp.where((f > 1e-12) & (f < 1.0 - 1e-12), entropy, 0.0)
    return f, entropy.sum()


def _aufbau_fill(eps, n_el, ao_mask):
    """Integer/aufbau filling of one spin channel."""
    big = 1.0e3
    e = jnp.where(ao_mask > 0.5, eps, big)
    order = jnp.argsort(e)
    ranks = jnp.argsort(order)
    f = jnp.clip(n_el - ranks, 0.0, 1.0)
    return f, jnp.zeros((), f.dtype)


def occupations(eps, nelec, nuhf, kt, ao_mask, fixed: bool):
    """Two-channel filling; returns (f_total in [0,2], total entropy)."""
    na = 0.5 * (nelec + nuhf)
    nb = 0.5 * (nelec - nuhf)
    if fixed:
        fa, sa = _aufbau_fill(eps, na, ao_mask)
        fb, sb = _aufbau_fill(eps, nb, ao_mask)
    else:
        fa, sa = _fermi_fill(eps, na, kt, ao_mask)
        fb, sb = _fermi_fill(eps, nb, kt, ao_mask)
    return fa + fb, sa + sb


# ---------------------------------------------------------------------------
# SCF machinery
# ---------------------------------------------------------------------------


@jax.custom_vjp
def eigh_safe(a):
    """Symmetric eigendecomposition with a degeneracy-safe backward pass.

    jax's stock eigh VJP divides by eigenvalue gaps, producing NaN for
    EXACTLY degenerate spectra (symmetric molecules; coincident GMBE caps;
    padded levels). This regularizes the gap kernel
    F_ij = g / (g^2 + eps), which is exact away from degeneracy and gives
    the correct limit for gauge-invariant downstream functions (energies,
    density matrices with equal occupations in the degenerate block).

    Returns a plain (eigenvalues, eigenvectors) tuple.
    """
    w, v = jnp.linalg.eigh(a)
    return w, v


def _eigh_safe_fwd(a):
    w, v = jnp.linalg.eigh(a)
    return (w, v), (w, v)


def _eigh_safe_bwd(res, cot):
    w, v = res
    dw, dv = cot
    gap = w[..., None, :] - w[..., :, None]  # (i, j): w_j - w_i
    # Dtype-aware degeneracy cut (round-3 silent-bug fix): eigh's own
    # eigenvalue noise is ~eps_mach*||A||, so numerically-degenerate pairs
    # (identical-monomer MBE dimers, coincident GMBE caps, padded levels)
    # show gaps at that scale rather than 0. The old kernel g/(g^2+1e-18)
    # was f64-tuned: at f32 noise gaps (~1e-6) it amplified by ~1e6 and the
    # degenerate-block cancellation failed, returning ~40-200x-wrong
    # gradients while the SCC reported converged. Gaps below
    # sqrt(eps_mach) (f32: 3.5e-4, f64: 1.5e-8 Ha) are treated as exact
    # degeneracies and their coupling zeroed — the correct limit for
    # gauge-invariant outputs (energies, equal-occupation densities).
    tol = jnp.sqrt(jnp.finfo(w.dtype).eps)
    keep = jnp.abs(gap) > tol
    f = jnp.where(keep, 1.0 / jnp.where(keep, gap, 1.0), 0.0)
    inner = f * (jnp.swapaxes(v, -1, -2) @ dv)
    idx = jnp.arange(w.shape[-1])
    inner = inner.at[..., idx, idx].add(dw)
    da = v @ inner @ jnp.swapaxes(v, -1, -2)
    return (0.5 * (da + jnp.swapaxes(da, -1, -2)),)


eigh_safe.defvjp(_eigh_safe_fwd, _eigh_safe_bwd)


def _ortho_factors(S):
    """Canonical orthogonalizer with linear-dependence removal.

    Near-duplicate AOs (coincident GMBE caps) make S near-singular; the
    previous Cholesky route amplified eigh noise there into SCC
    bistability — one decane 2-cap intersection term oscillated at
    residual 0.43 and converged to DIFFERENT fixed points in different
    batch contexts, shifting the assembled GMBE total by 7e-4. Canonical
    orthogonalization X = U s^-1/2 U^T with combos below 1e-7 projected
    out (tblite's lindep handling) is deterministic; the removed
    directions are pinned at +PAD_LEVEL in the transformed Fock so they
    are never occupied (same trick as padded AOs)."""
    s, U = eigh_safe(S)
    keep = (s > 1e-7).astype(S.dtype)
    w = jnp.where(s > 1e-7, jax.lax.rsqrt(jnp.maximum(s, 1e-7)), 0.0)
    Xs = (U * w[None, :]) @ U.T
    n = S.shape[-1]
    proj_out = jnp.eye(n, dtype=S.dtype) - (U * keep[None, :]) @ U.T
    return Xs, proj_out


def _general_eigh(F, ortho):
    """Generalized eigenproblem via canonical orthogonalization factors."""
    Xs, proj_out = ortho
    eps, Cp = eigh_safe(Xs @ F @ Xs + PAD_LEVEL * proj_out)
    return eps, Xs @ Cp


def _atom_charges(q_sh, batch):
    nat = batch.at_gam3.shape[0]
    return jnp.zeros(nat, q_sh.dtype).at[batch.sh_atom].add(q_sh * batch.sh_mask)


def _coulomb_potential(q_sh, gamma, batch, settings, gamma_at=None):
    """v_sh = dE_coul/dq_sh (shell); third-order + atom-level (solvation)."""
    v = gamma @ q_sh
    if settings.third_order or gamma_at is not None:
        q_at = _atom_charges(q_sh, batch)
        v_at = jnp.zeros_like(q_at)
        if settings.third_order:
            v_at = v_at + batch.at_gam3 * q_at**2
        if gamma_at is not None:
            v_at = v_at + gamma_at @ q_at
        v = v + v_at[batch.sh_atom]
    return v


def _coulomb_energy(q_sh, gamma, batch, settings, gamma_at=None):
    e2 = 0.5 * q_sh @ (gamma @ q_sh)
    if settings.third_order or gamma_at is not None:
        q_at = _atom_charges(q_sh, batch)
        if settings.third_order:
            e2 = e2 + (batch.at_gam3 * q_at**3).sum() / 3.0
        if gamma_at is not None:
            e2 = e2 + 0.5 * q_at @ (gamma_at @ q_at)
    return e2


def _fock(H0, S, q_sh, gamma, batch, settings, gamma_at=None):
    v_sh = _coulomb_potential(q_sh, gamma, batch, settings, gamma_at)
    v_ao = v_sh[batch.ao_shell]
    # population derivative: dE/dn = -dE/dq
    shift = -0.5 * (v_ao[:, None] + v_ao[None, :]) * S
    return H0 + shift


def _shell_populations(P, S, batch):
    ps = (P * S).sum(axis=1)  # (PS)_mumu for symmetric S
    nsh = batch.sh_mask.shape[0]
    return jnp.zeros(nsh, ps.dtype).at[batch.ao_shell].add(ps * batch.ao_mask)


# ---------------------------------------------------------------------------
# GFN2 multipole (AES) machinery: the SCC state generalizes from shell
# charges to (q_sh, mu_A, theta_A); the interaction energy is a function of
# these moments, its gradients are the SCC potentials, and the Fock
# contribution follows from the moments being LINEAR maps of P.
# ---------------------------------------------------------------------------


def _aes_pack(q, mu, th):
    return jnp.concatenate([q, mu.ravel(), th.ravel()])


def _aes_unpack(z, nsh, nat):
    q = z[:nsh]
    mu = z[nsh : nsh + 3 * nat].reshape(nat, 3)
    th = z[nsh + 3 * nat :].reshape(nat, 6)
    return q, mu, th


def _aes_interaction(q_sh, mu, th, coords, gamma, batch, settings,
                     gamma_at, mp):
    """Moment-dependent interaction energy for GFN2: isotropic second +
    third order (existing machinery) + AES + charge-scaled dispersion."""
    from .dispersion_d3 import d3_energy
    from .gfn2 import aes_energy, d4_zeta

    e = _coulomb_energy(q_sh, gamma, batch, settings, gamma_at)
    q_at = _atom_charges(q_sh, batch)
    aes_p = mp["at_aes"]
    e = e + aes_energy(
        coords, q_at, mu, th,
        aes_p[:, 0], aes_p[:, 1], aes_p[:, 2], batch.atom_mask,
    )
    if mp.get("d4", False):
        zeta = d4_zeta(q_at, aes_p[:, 3], aes_p[:, 4], batch.atom_mask)
        d3tab = dict(mp["d3tab"])
        # scale the pair C6 table by zeta_A zeta_B (charge-dependent C6)
        e = e + d3_energy(
            coords, mp["cn"], d3tab, batch.atom_mask,
            batch.glb[12], batch.glb[13], batch.glb[14], batch.glb[15],
            c6_scale=zeta[:, None] * zeta[None, :],
        )
    return e


def _aes_fock(H0, S, z, coords, gamma, batch, settings, gamma_at, mp):
    """Fock matrix for the multipole SCC state z = (q_sh, mu, theta)."""
    nsh = batch.sh_mask.shape[0]
    nat = batch.atom_mask.shape[0]
    q, mu, th = _aes_unpack(z, nsh, nat)
    vq, vmu, vth = jax.grad(_aes_interaction, argnums=(0, 1, 2))(
        q, mu, th, coords, gamma, batch, settings, gamma_at, mp
    )
    # charge part: dE/dn = -dE/dq, standard shift
    v_ao = vq[batch.ao_shell]
    F = H0 - 0.5 * (v_ao[:, None] + v_ao[None, :]) * S
    # multipole part: mu_A = -sum_{k in A, l} P_kl D_kl  (linear in P).
    # theta is stored TRACELESS (camm_moments subtracts tr/3 from the
    # diagonal); the adjoint of that projection must be applied to the
    # theta-potential before contracting with the RAW quadrupole integrals,
    # or the variational trace identity (and the stationarity the gradient
    # path relies on) breaks.
    D, Q = mp["D"], mp["Q"]
    tr_v = (vth[:, 0] + vth[:, 1] + vth[:, 2]) / 3.0
    vth_eff = (
        vth.at[:, 0].add(-tr_v).at[:, 1].add(-tr_v).at[:, 2].add(-tr_v)
    )
    G = -jnp.einsum("kd,dkl->kl", vmu[batch.ao_atom], D) - jnp.einsum(
        "kd,dkl->kl", vth_eff[batch.ao_atom], Q
    )
    return F + 0.5 * (G + G.T), (vq, vmu, vth_eff)


def _aes_moments_of_P(P, S, batch, mp):
    from .gfn2 import camm_moments

    n_sh = _shell_populations(P, S, batch)
    q = (batch.sh_refocc - n_sh) * batch.sh_mask
    mu, th = camm_moments(
        P, S, mp["D"], mp["Q"], batch.ao_atom, batch.atom_mask.shape[0]
    )
    mu = mu * batch.atom_mask[:, None]
    th = th * batch.atom_mask[:, None]
    return q, mu, th


def scf_solve_multipole(H0, S, coords, gamma, batch, kt,
                        settings: EngineSettings, gamma_at, mp, z0=None):
    """Anderson-mixed SCC over the extended moment state (GFN2/AES).

    z0: optional warm start (packed AES state) — e.g. f32 device charges
    handed to the f64 host polish. The fixed point is unique, so the warm
    start only changes how fast the tolerance is reached.
    """
    L = _ortho_factors(S)
    nsh = batch.sh_mask.shape[0]
    nat = batch.atom_mask.shape[0]
    nz = nsh + 9 * nat
    m = settings.broyden_memory
    beta = settings.mixer_damping
    dtype = S.dtype

    def fixed_point(z):
        F, _ = _aes_fock(H0, S, z, coords, gamma, batch, settings,
                         gamma_at, mp)
        eps, C = _general_eigh(F, L)
        f, _ = occupations(
            eps, batch.nelec, batch.nuhf, kt, batch.ao_mask,
            settings.fixed_occupations,
        )
        P = (C * f[None, :]) @ C.T
        q, mu, th = _aes_moments_of_P(P, S, batch, mp)
        return _aes_pack(q, mu, th)

    def body(carry):
        z, _, hist_x, hist_f, it = carry
        z_out = fixed_point(z)
        f_res = z_out - z
        resid = jnp.abs(f_res).max()
        slot = it % m
        hist_x = hist_x.at[slot].set(z)
        hist_f = hist_f.at[slot].set(f_res)
        prev = (it - 1) % m
        dX = hist_x - hist_x[prev][None, :]
        dF = hist_f - hist_f[prev][None, :]
        valid = (jnp.arange(m) <= it) & (jnp.arange(m) != prev)
        dF = jnp.where(valid[:, None], dF, 0.0)
        dX = jnp.where(valid[:, None], dX, 0.0)
        G = dF @ dF.T
        reg = 1e-4 if dtype == jnp.float32 else 1e-12
        G = G + (reg * jnp.trace(G) / m + 1e-30) * jnp.eye(m, dtype=dtype)
        c = jnp.linalg.solve(G, dF @ f_res)
        z_and = z + beta * f_res - c @ (dX + beta * dF)
        z_damped = z + beta * f_res
        c_lim = 2.0 if dtype == jnp.float32 else 1e3
        bad = (
            (it < 1)
            | ~jnp.isfinite(z_and).all()
            | (jnp.abs(c).max() > c_lim)
        )
        z_next = jnp.where(bad, z_damped, z_and)
        return (z_next, resid, hist_x, hist_f, it + 1)

    def cond(carry):
        _z, resid, _hx, _hf, it = carry
        return (it < settings.max_scf_iter) & (resid > settings.scf_tol)

    z0 = (jnp.zeros(nz, dtype=dtype) if z0 is None
          else jnp.asarray(z0, dtype=dtype))
    hist_x = jnp.zeros((m, nz), dtype=dtype)
    hist_f = jnp.zeros((m, nz), dtype=dtype)
    z, resid, _, _, _ = jax.lax.while_loop(
        cond, body,
        (z0, jnp.asarray(1.0, dtype), hist_x, hist_f, jnp.asarray(0)),
    )
    return z, resid


def electronic_energy_multipole(coords, z_star, batch, kt,
                                settings: EngineSettings, gamma_at, mp):
    """Variational energy at the converged moment state (GFN2/AES)."""
    from .multipole import moment_matrices

    # S from the overlap builder (padded-diagonal identity handling);
    # moment_matrices supplies the dipole/quadrupole integrals
    S = overlap_matrix(
        coords, batch.ao_atom, batch.ao_lxyz, batch.prim_alpha,
        batch.prim_coeff,
    )
    _S_mm, D, Q = moment_matrices(
        coords, batch.ao_atom, batch.ao_lxyz, batch.prim_alpha,
        batch.prim_coeff,
    )
    cn = coordination_numbers(
        coords, batch.at_rcov, batch.atom_mask, batch.glb[11],
        settings.cn_type,
    )
    H0 = h0_matrix(S, coords, batch, cn, settings)
    gamma = gamma_matrix(coords, batch, settings)
    mp = dict(mp)
    # D4-style dispersion uses the D3 counting function, not the H0 one
    mp["cn"] = coordination_numbers(
        coords, batch.at_rcov, batch.atom_mask, batch.glb[11],
        settings.cn_type_d3,
    )
    mp["D"], mp["Q"] = D, Q

    F, (vq, vmu, vth) = _aes_fock(
        H0, S, z_star, coords, gamma, batch, settings, gamma_at, mp
    )
    L = _ortho_factors(S)
    eps, C = _general_eigh(F, L)
    f, entropy = occupations(
        eps, batch.nelec, batch.nuhf, kt, batch.ao_mask,
        settings.fixed_occupations,
    )
    f = jax.lax.stop_gradient(f)
    e_band = (f * eps).sum()

    nsh = batch.sh_mask.shape[0]
    nat = batch.atom_mask.shape[0]
    q, mu, th = _aes_unpack(z_star, nsh, nat)
    n_star = (batch.sh_refocc - q) * batch.sh_mask
    # Tr(P(F-H0)) = -sum v_q n + v_mu.mu + v_th.th  (moments linear in P)
    e_el = (
        e_band
        + (vq * n_star).sum()
        - (vmu * mu).sum()
        - (vth * th).sum()
        + _aes_interaction(
            q, mu, th, coords, gamma, batch, settings, gamma_at, mp
        )
    )
    if settings.include_entropy and not settings.fixed_occupations:
        e_el = e_el - kt * jax.lax.stop_gradient(entropy)
    return e_el, eps, f, entropy


def scf_solve(H0, S, gamma, batch, kt, settings: EngineSettings, gamma_at=None,
              q0=None):
    """Bounded SCC loop (not differentiated) with Anderson mixing.

    q0: optional warm-start shell charges (e.g. f32 device charges handed
    to the f64 host polish). The fixed point is unique, so the warm start
    only changes how fast the tolerance is reached.

    Runs until the charge residual drops below settings.scf_tol or
    max_scf_iter is reached (tblite parity: iterate to tolerance, not to
    the budget — mqc_method_xtb.f90 delegates the same policy to tblite).

    Returns converged shell charges q* and the final charge residual.
    Anderson acceleration (window m, Tikhonov-regularized normal equations)
    plays the role of tblite's Broyden mixer — the converged point is
    mixer-independent; this just gets there in ~3x fewer diagonalizations.
    """
    fast_inloop = settings.use_pallas_eigh and S.dtype == jnp.float32
    use_pallas = fast_inloop and S.shape[-1] <= PALLAS_EIGH_MAX_N
    # Above the Jacobi kernel's VMEM ceiling, switch the in-loop solver to
    # SP2 density purification (ops/sp2.py): ~48 batched (N,N) matmuls on
    # the MXU replace the latency-bound XLA eigh. Valid inside the
    # fixed-point loop because only the density/shell populations are
    # needed; the final variational energy always re-solves with jnp eigh.
    use_sp2 = fast_inloop and S.shape[-1] > PALLAS_EIGH_MAX_N
    if use_pallas or use_sp2:
        # Orthogonalize once via canonical S^-1/2 WITH linear-dependence
        # removal, mirroring the f64 path's _ortho_factors: coincident GMBE
        # caps make S singular, and the old bare rsqrt(max(s, 1e-10)) clamp
        # amplified f32 null-space eigenvalue noise by ~1e5 (ADVICE r3).
        # Threshold 1e-5 is the f32-scaled analog of the f64 path's 1e-7
        # (eigh eigenvalue noise ~ eps_mach * ||S||); removed combos are
        # pinned at +PAD_LEVEL in the transformed Fock so they are never
        # occupied by either the Jacobi solver or SP2's trace projection.
        s_eig, U = jnp.linalg.eigh(S)
        lindep = 1e-5
        s_keep = (s_eig > lindep).astype(S.dtype)
        winv = jnp.where(
            s_eig > lindep, jax.lax.rsqrt(jnp.maximum(s_eig, lindep)), 0.0
        )
        Xs = (U * winv[None, :]) @ U.T
        shift_out = PAD_LEVEL * (
            jnp.eye(S.shape[-1], dtype=S.dtype) - (U * s_keep[None, :]) @ U.T
        )
        L = S  # unused

    if use_sp2:
        from ...ops.sp2 import sp2_density

        def make_density(F):
            Po = sp2_density(
                Xs @ F @ Xs + shift_out,
                batch.nelec, batch.nuhf, batch.ao_mask,
            )
            return Xs @ Po @ Xs

    else:
        if use_pallas:
            # Jacobi kernel inside the loop
            from ...ops.jacobi_eigh import jacobi_eigh

            def solve_eigh(F, _L):
                eps, Cp = jacobi_eigh(Xs @ F @ Xs + shift_out)
                return eps, Xs @ Cp

        else:
            solve_eigh = _general_eigh
            L = _ortho_factors(S)

        def make_density(F):
            eps, C = solve_eigh(F, L)
            f, _ = occupations(
                eps, batch.nelec, batch.nuhf, kt, batch.ao_mask,
                settings.fixed_occupations,
            )
            return (C * f[None, :]) @ C.T

    nsh = batch.sh_mask.shape[0]
    m = settings.broyden_memory
    beta = settings.mixer_damping
    dtype = S.dtype
    # carry follows S even under x64 (CPU tests)
    q0 = jnp.zeros(nsh, dtype) if q0 is None else jnp.asarray(q0, dtype)

    def fixed_point(q):
        F = _fock(H0, S, q, gamma, batch, settings, gamma_at)
        P = make_density(F)
        n_sh = _shell_populations(P, S, batch)
        return (batch.sh_refocc - n_sh) * batch.sh_mask

    def body(carry):
        q, _, hist_x, hist_f, it = carry
        q_out = fixed_point(q)
        f_res = q_out - q
        resid = jnp.abs(f_res).max()

        slot = it % m
        hist_x = hist_x.at[slot].set(q)
        hist_f = hist_f.at[slot].set(f_res)

        # Anderson: minimize ||f + dF c|| over window differences
        prev = (it - 1) % m
        dX = hist_x - hist_x[prev][None, :]  # rows: x_k - x_prev (approx)
        dF = hist_f - hist_f[prev][None, :]
        valid = (jnp.arange(m) <= it) & (jnp.arange(m) != prev)
        dF = jnp.where(valid[:, None], dF, 0.0)
        dX = jnp.where(valid[:, None], dX, 0.0)
        G = dF @ dF.T
        # scale-aware Tikhonov regularization keeps f32 well-conditioned
        reg = 1e-4 if dtype == jnp.float32 else 1e-12
        G = G + (reg * jnp.trace(G) / m + 1e-30) * jnp.eye(m, dtype=dtype)
        rhs = dF @ f_res
        c = jnp.linalg.solve(G, rhs)
        q_and = q + beta * f_res - c @ (dX + beta * dF)
        q_damped = q + beta * f_res
        # safeguard: reject wild extrapolations (critical in f32, where the
        # fixed-point map carries eigh noise), non-finite steps, warm start
        c_lim = 2.0 if dtype == jnp.float32 else 1e3
        bad = (
            (it < 1)
            | ~jnp.isfinite(q_and).all()
            | (jnp.abs(c).max() > c_lim)
        )
        q_next = jnp.where(bad, q_damped, q_and)
        return (q_next, resid, hist_x, hist_f, it + 1)

    def cond(carry):
        # bounded by the iteration budget AND the early-exit tolerance
        # (scf_tol=0.0 reproduces fixed-iteration semantics). Never
        # differentiated, so while_loop is safe.
        _q, resid, _hx, _hf, it = carry
        return (it < settings.max_scf_iter) & (resid > settings.scf_tol)

    hist_x = jnp.zeros((m, nsh), dtype=dtype)
    hist_f = jnp.zeros((m, nsh), dtype=dtype)
    q, resid, _, _, _ = jax.lax.while_loop(
        cond, body,
        (q0, jnp.asarray(1.0, dtype), hist_x, hist_f, jnp.asarray(0)),
    )
    return q, resid


def scf_refine(H0, S, gamma, batch, kt, settings: EngineSettings, q0,
               n_iter: int, gamma_at=None):
    """Differentiable fixed-point refinement from a converged warm start.

    Plain damped iterations (contraction around the converged point), fully
    traced — gives q*(theta, R) with exact derivatives via truncated
    backprop, which converges geometrically since |q0 - q*| is already at
    solver tolerance. Used for second-derivative quantities (e.g. parameter
    Jacobians of gradient norms) where the stationarity trick is not enough.
    """
    L = _ortho_factors(S)

    def step(q, _):
        F = _fock(H0, S, q, gamma, batch, settings, gamma_at)
        eps, C = _general_eigh(F, L)
        f, _ = occupations(
            eps, batch.nelec, batch.nuhf, kt, batch.ao_mask,
            settings.fixed_occupations,
        )
        f = jax.lax.stop_gradient(f)  # exact for gapped systems
        P = (C * f[None, :]) @ C.T
        n_sh = _shell_populations(P, S, batch)
        q_new = (batch.sh_refocc - n_sh) * batch.sh_mask
        return q + 0.5 * (q_new - q), None

    q, _ = jax.lax.scan(step, q0, None, length=n_iter)
    return q


def scf_refine_multipole(H0, S, coords, gamma, batch, kt,
                         settings: EngineSettings, gamma_at, mp, z0,
                         n_iter: int):
    """Differentiable damped refinement of the packed AES state (GFN2).

    The multipole analog of scf_refine: plain damped fixed-point steps on
    the packed (shell charges, atomic dipoles, quadrupoles) vector from a
    (near-)converged warm start, fully traced — the warm-start entry the
    f64 host polish uses on the GFN2 path (methods/xtb/polish.py).
    """
    L = _ortho_factors(S)
    beta = settings.mixer_damping

    def fixed_point(z):
        F, _ = _aes_fock(H0, S, z, coords, gamma, batch, settings,
                         gamma_at, mp)
        eps, C = _general_eigh(F, L)
        f, _ = occupations(
            eps, batch.nelec, batch.nuhf, kt, batch.ao_mask,
            settings.fixed_occupations,
        )
        f = jax.lax.stop_gradient(f)  # exact for gapped systems
        P = (C * f[None, :]) @ C.T
        q, mu, th = _aes_moments_of_P(P, S, batch, mp)
        return _aes_pack(q, mu, th)

    def step(z, _):
        return z + beta * (fixed_point(z) - z), None

    z, _ = jax.lax.scan(step, z0, None, length=n_iter)
    return z


def electronic_energy(
    coords, q_star, batch, kt, settings: EngineSettings, gamma_at=None
):
    """Variational total electronic energy at converged charges q*.

    Differentiable in `coords`; q* must be stop-gradient'ed by the caller.
    gamma_at: optional atom-level kernel addition (solvation), a function of
    coords upstream so its geometric derivatives flow. Returns
    (E_el, eps, f, entropy) — eps/f for downstream analysis.
    """
    S = overlap_matrix(
        coords, batch.ao_atom, batch.ao_lxyz, batch.prim_alpha, batch.prim_coeff
    )
    cn = coordination_numbers(
        coords, batch.at_rcov, batch.atom_mask, batch.glb[11],
        settings.cn_type,
    )
    H0 = h0_matrix(S, coords, batch, cn, settings)
    gamma = gamma_matrix(coords, batch, settings)

    F = _fock(H0, S, q_star, gamma, batch, settings, gamma_at)
    L = _ortho_factors(S)
    eps, C = _general_eigh(F, L)
    f, entropy = occupations(
        eps, batch.nelec, batch.nuhf, kt, batch.ao_mask,
        settings.fixed_occupations,
    )
    f = jax.lax.stop_gradient(f)
    e_band = (f * eps).sum()

    v_sh = _coulomb_potential(q_star, gamma, batch, settings, gamma_at)
    n_star = (batch.sh_refocc - q_star) * batch.sh_mask
    # E_band = tr(P H0) - sum_sh v_sh n_sh, so adding back sum v n* recovers
    # tr(P H0); E_coul then adds the charge-fluctuation energy once.
    e_el = e_band + (v_sh * n_star).sum() + _coulomb_energy(
        q_star, gamma, batch, settings, gamma_at
    )
    if settings.include_entropy and not settings.fixed_occupations:
        e_el = e_el - kt * jax.lax.stop_gradient(entropy)
    return e_el, eps, f, entropy
