"""Batched symmetric eigendecomposition via cyclic Jacobi (Pallas TPU).

Motivation: an MBE fragment batch diagonalizes MANY small Fock matrices
(16-64 AOs) every SCC iteration. XLA's `eigh` on TPU is latency-bound at
these sizes (measured ~0.001 TFLOP/s at N=16); a lane-vectorized Jacobi
sweep processes 128 matrices per program with pure VPU work.

Layout: matrices are transposed to (N, N, B) so the BATCH rides the
128-wide lane dimension; each grid program owns a (N, N, 128) tile in VMEM
and runs `sweeps` full cyclic Jacobi sweeps (all (p, q) pairs, unrolled at
trace time - static shapes, no data-dependent control flow).

Used ONLY inside the non-differentiated SCC fixed-point loop
(engine.scf_solve); the variational-functional energy evaluation keeps
jnp.linalg.eigh so autodiff paths are untouched. Eigenvalues come out
UNSORTED (Fermi filling is order-independent).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

LANES = 128


def _pair_table(n: int) -> np.ndarray:
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]
    return np.asarray(pairs, dtype=np.int32)


def _jacobi_kernel(pq_ref, a_ref, w_ref, v_ref, awork, n: int, sweeps: int):
    awork[:, :, :] = a_ref[:, :, :]

    # V = I, broadcast over lanes (build as a full (n, n, LANES) constant)
    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=a_ref.dtype)[:, :, None], (n, n, LANES)
    )
    v_ref[:, :, :] = eye

    npairs = n * (n - 1) // 2

    def step(k, _):
        j = k % npairs
        p = pq_ref[j, 0]
        q = pq_ref[j, 1]

        rp = awork[pl.ds(p, 1), :, :][0]      # (n, 128)
        rq = awork[pl.ds(q, 1), :, :][0]
        app = awork[pl.ds(p, 1), pl.ds(p, 1), :][0]  # (1, 128)
        aqq = awork[pl.ds(q, 1), pl.ds(q, 1), :][0]
        apq = awork[pl.ds(p, 1), pl.ds(q, 1), :][0]

        # branch-free rotation: t = sign(tau)/(|tau| + sqrt(1 + tau^2))
        denom = 2.0 * apq
        safe = jnp.abs(denom) > 1e-12 * (jnp.abs(app) + jnp.abs(aqq) + 1.0)
        tau = (aqq - app) / jnp.where(safe, denom, 1.0)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(safe, t, 0.0)
        c = jax.lax.rsqrt(1.0 + t * t)        # (1, 128)
        s = t * c

        # two-sided rotation: rows then columns of A
        awork[pl.ds(p, 1), :, :] = (c * rp - s * rq)[None]
        awork[pl.ds(q, 1), :, :] = (s * rp + c * rq)[None]
        cp = awork[:, pl.ds(p, 1), :][:, 0]   # (n, 128)
        cq = awork[:, pl.ds(q, 1), :][:, 0]
        awork[:, pl.ds(p, 1), :] = (c * cp - s * cq)[:, None]
        awork[:, pl.ds(q, 1), :] = (s * cp + c * cq)[:, None]

        # eigenvectors: V <- V J (columns p, q)
        vp = v_ref[:, pl.ds(p, 1), :][:, 0]
        vq = v_ref[:, pl.ds(q, 1), :][:, 0]
        v_ref[:, pl.ds(p, 1), :] = (c * vp - s * vq)[:, None]
        v_ref[:, pl.ds(q, 1), :] = (s * vp + c * vq)[:, None]
        return _

    jax.lax.fori_loop(0, sweeps * npairs, step, 0)

    # diagonal -> eigenvalues: extract via mask + reduce over one axis
    diag_mask = jnp.eye(n, dtype=a_ref.dtype)[:, :, None]
    w_ref[:, :] = (awork[:, :, :] * diag_mask).sum(axis=1)


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def batched_jacobi_eigh(a, sweeps: int = 12, interpret: bool = False):
    """Eigendecomposition of a batch of small symmetric matrices.

    a: (B, N, N) float32/float64. Returns (w (B, N) UNSORTED, v (B, N, N))
    with v[..., :, k] the eigenvector of w[..., k].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = a.shape
    bp = ((b + LANES - 1) // LANES) * LANES
    if bp != b:
        pad = jnp.broadcast_to(
            jnp.eye(n, dtype=a.dtype)[None], (bp - b, n, n)
        )
        a = jnp.concatenate([a, pad], axis=0)

    at = jnp.transpose(a, (1, 2, 0))  # (N, N, Bp)
    pq = jnp.asarray(_pair_table(n))

    kernel = partial(_jacobi_kernel, n=n, sweeps=sweeps)
    w_t, v_t = pl.pallas_call(
        kernel,
        grid=(bp // LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, bp), a.dtype),
            jax.ShapeDtypeStruct((n, n, bp), a.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n, n, LANES), a.dtype)],
        interpret=interpret,
    )(pq, at)

    w = jnp.transpose(w_t, (1, 0))[:b]
    v = jnp.transpose(v_t, (2, 0, 1))[:b]
    return w, v


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _single_eigh_fn(sweeps: int):
    """Single-matrix wrapper whose vmap rule collapses the batch into ONE
    pallas call (plain vmap of pallas_call would pad every matrix to a full
    128-lane tile — 127/128 waste)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def eigh1(a):
        w, v = batched_jacobi_eigh(a[None], sweeps=sweeps)
        return w[0], v[0]

    @eigh1.def_vmap
    def _rule(axis_size, in_batched, a):
        w, v = batched_jacobi_eigh(a, sweeps=sweeps)
        return (w, v), (True, True)

    return eigh1


def jacobi_eigh(a, sweeps: int = 10):
    """eigh of ONE small symmetric matrix; batches efficiently under vmap.

    Returns (w UNSORTED, v). Intended for the SCC fixed-point loop where
    ordering is irrelevant (Fermi filling) and no autodiff passes through.
    """
    return _single_eigh_fn(sweeps)(a)
