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

LANES = 128


def _jacobi_kernel(a_ref, w_ref, v_ref, awork, n: int, sweeps: int):
    awork[:, :, :] = a_ref[:, :, :]

    # V = I, broadcast over lanes
    for i in range(n):
        row = jnp.zeros((n, LANES), dtype=a_ref.dtype)
        v_ref[i, :, :] = row.at[i, :].set(1.0)

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                rp = awork[p, :, :]              # (n, 128)
                rq = awork[q, :, :]
                app = rp[p : p + 1, :]           # (1, 128)
                aqq = rq[q : q + 1, :]
                apq = rp[q : q + 1, :]

                # branch-free rotation angle:
                # t = sign(tau) / (|tau| + sqrt(1 + tau^2))
                denom = 2.0 * apq
                safe = jnp.abs(denom) > 1e-12 * (
                    jnp.abs(app) + jnp.abs(aqq) + 1.0
                )
                tau = (aqq - app) / jnp.where(safe, denom, 1.0)
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(safe, t, 0.0)
                c = jax.lax.rsqrt(1.0 + t * t)
                s = t * c

                # two-sided rotation: rows then columns of A
                awork[p, :, :] = c * rp - s * rq
                awork[q, :, :] = s * rp + c * rq
                cp = awork[:, p, :]
                cq = awork[:, q, :]
                awork[:, p, :] = c[0] * cp - s[0] * cq
                awork[:, q, :] = s[0] * cp + c[0] * cq

                # eigenvectors: V <- V J (columns p, q)
                vp = v_ref[:, p, :]
                vq = v_ref[:, q, :]
                v_ref[:, p, :] = c[0] * vp - s[0] * vq
                v_ref[:, q, :] = s[0] * vp + c[0] * vq

    for i in range(n):
        w_ref[i, :] = awork[i, i, :]


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

    kernel = partial(_jacobi_kernel, n=n, sweeps=sweeps)
    w_t, v_t = pl.pallas_call(
        kernel,
        grid=(bp // LANES,),
        in_specs=[
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
    )(at)

    w = jnp.transpose(w_t, (1, 0))[:b]
    v = jnp.transpose(v_t, (2, 0, 1))[:b]
    return w, v
