"""Pallas batched Jacobi eigensolver: correctness in interpret mode (CPU)."""

import numpy as np
import pytest


def test_jacobi_eigh_matches_lapack():
    import jax.numpy as jnp

    from metalquicha_tpu.ops.jacobi_eigh import batched_jacobi_eigh

    rng = np.random.default_rng(0)
    B, N = 2, 8
    a = rng.normal(size=(B, N, N)).astype(np.float32)
    a = a + a.transpose(0, 2, 1)
    w, v = batched_jacobi_eigh(jnp.asarray(a), sweeps=10, interpret=True)
    w = np.asarray(w)
    v = np.asarray(v)
    wr, _ = np.linalg.eigh(a)
    np.testing.assert_allclose(np.sort(w, axis=1), wr, atol=5e-5)
    for b in range(B):
        resid = a[b] @ v[b] - v[b] * w[b][None, :]
        assert np.abs(resid).max() < 5e-5
        assert np.abs(v[b].T @ v[b] - np.eye(N)).max() < 1e-5
