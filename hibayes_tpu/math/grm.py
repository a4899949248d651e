"""Genomic relationship matrix (GRM) on the MXU.

TPU-native equivalent of the reference's BLAS dsyrk path
(reference: src/rm.cpp:5-53): center columns, G = Zc Zc^T, normalise by
mean(diag), optional inverse / eigendecomposition (for BSLMM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def make_grm(M, lambda_=0.0, inverse=False, eigen=False, dtype=None):
    M = jnp.asarray(M, dtype or jnp.result_type(M, jnp.float32))
    Zc = M - jnp.mean(M, axis=0, keepdims=True)
    G = jnp.matmul(Zc, Zc.T, precision=HIGHEST)
    G = G / jnp.mean(jnp.diag(G))
    if inverse:
        if lambda_:
            G = G + lambda_ * jnp.eye(G.shape[0], dtype=G.dtype)
        return jnp.linalg.inv(G)
    if eigen:
        if lambda_:
            G = G + lambda_ * jnp.eye(G.shape[0], dtype=G.dtype)
        vals, vecs = jnp.linalg.eigh(G)
        return vals, vecs
    return G
