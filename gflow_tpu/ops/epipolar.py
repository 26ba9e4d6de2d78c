"""Fundamental-matrix estimation + Sampson error, TPU-native.

Replaces cv2.findFundamentalMat(FM_LMEDS) in the reference's motion-mask
preparation (utility/move_seg.py:189-209; cv2 unavailable here). The LMedS
loop is fully batched for XLA: S random 8-point minimal samples are solved
simultaneously (batched 9x9 eigendecompositions), scored by the median of
squared Sampson errors over a point subsample, and the winner is refit by
least squares on its inlier set.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _design_rows(x1, x2):
    """Rows of the 8-point design matrix: x2^T F x1 = 0.
    x1, x2: (..., 2) -> (..., 9)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )


def _solve_f(A):
    """Least-squares F from design matrix A (..., M, 9): null vector of A^T A
    then rank-2 enforcement."""
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    w, V = jnp.linalg.eigh(AtA)         # ascending eigenvalues
    f = V[..., :, 0]                    # (..., 9)
    F = f.reshape(f.shape[:-1] + (3, 3))
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt)


def sampson_error(x1, x2, F):
    """Squared Sampson distance. x1, x2: (N, 2); F: (..., 3, 3) ->
    (..., N)."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)  # (N, 3)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    d1 = jnp.einsum("...ij,nj->...ni", F, h1)   # F x1
    d2 = jnp.einsum("...ji,nj->...ni", F, h2)   # F^T x2
    z = jnp.einsum("ni,...ni->...n", h2, d1)
    denom = d1[..., 0] ** 2 + d1[..., 1] ** 2 + d2[..., 0] ** 2 + d2[..., 1] ** 2
    return z**2 / jnp.maximum(denom, 1e-12)


@functools.partial(jax.jit, static_argnames=("n_samples", "n_score"))
def find_fundamental_lmeds(
    x1: jax.Array,  # (N, 2) normalized coords
    x2: jax.Array,
    key: jax.Array,
    n_samples: int = 512,
    n_score: int = 8192,
):
    """Returns (F (3,3), inlier_mask (N,)).

    LMedS: among `n_samples` batched minimal solutions, pick the one with the
    lowest median squared Sampson error (scored on `n_score` subsampled
    correspondences), then least-squares refit on its inliers
    (robust sigma = 1.4826 sqrt(med), inlier if err < (2.5 sigma)^2).
    """
    N = x1.shape[0]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n_samples, 8), 0, N)
    A = _design_rows(x1[idx], x2[idx])            # (S, 8, 9)
    Fs = _solve_f(A)                              # (S, 3, 3)

    score_idx = jax.random.randint(k2, (min(n_score, N),), 0, N)
    xs1, xs2 = x1[score_idx], x2[score_idx]
    errs = sampson_error(xs1, xs2, Fs)            # (S, n_score)
    med = jnp.median(errs, axis=-1)
    best = jnp.argmin(med)
    F0 = Fs[best]

    sigma2 = (2.5 * 1.4826) ** 2 * med[best]
    err_all = sampson_error(x1, x2, F0)           # (N,)
    inliers = err_all < jnp.maximum(sigma2, 1e-12)

    # weighted least-squares refit over inliers
    A_all = _design_rows(x1, x2) * inliers[:, None]
    F = _solve_f(A_all)
    return F, inliers
