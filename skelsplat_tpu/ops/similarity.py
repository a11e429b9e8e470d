"""Per-view gradient consistency analysis (port of utils/similarity_utils.py).

Analysis-only in the reference (never imported by the entry points; relates
to the paper's per-view confidence weighting ideas): pairwise cosine
similarity between the per-view xyz gradients, consistency scores, and
consistency-based view weighting / selection. All batched jnp — the (V,N,3)
per-view gradient stack produced by the trainer's vmapped backward feeds
straight in.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_similarity_matrix(grads, eps: float = 1e-8):
    """(V,N,3) per-view, per-joint gradients → (N,V,V) pairwise cosine
    similarity between views, per joint (similarity_utils.py:9-40)."""
    g = jnp.transpose(grads, (1, 0, 2))                      # (N,V,3)
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    gn = g / jnp.maximum(norm, eps)
    return jnp.einsum("nvc,nwc->nvw", gn, gn)


def view_consistency_scores(grads, eps: float = 1e-8):
    """(V,N,3) → (N,V): mean cosine similarity of each view's gradient to
    the other views' (diagonal excluded) — a per-view agreement score
    (similarity_utils.py:43-78)."""
    sim = cosine_similarity_matrix(grads, eps)               # (N,V,V)
    v = sim.shape[-1]
    off = sim - jnp.eye(v)[None]
    return jnp.sum(off, axis=-1) / jnp.maximum(v - 1, 1)


def consistency_weights(grads, temperature: float = 1.0, eps: float = 1e-8):
    """(V,N,3) → (V,N) softmax weights over views by agreement score —
    the consistency-based per-view weighting (similarity_utils.py:81-140)."""
    scores = view_consistency_scores(grads, eps)             # (N,V)
    w = jnp.exp(scores / temperature)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.transpose(w, (1, 0))


def select_consistent_views(grads, k: int, eps: float = 1e-8):
    """(V,N,3) → (N,k) indices of the k most agreeing views per joint
    (similarity_utils.py:143-205, consistency-based view selection)."""
    scores = view_consistency_scores(grads, eps)             # (N,V)
    idx = jnp.argsort(-scores, axis=-1)[:, :k]
    return idx


def weighted_gradient_fusion(grads, temperature: float = 1.0):
    """(V,N,3) → (N,3): consistency-weighted mean over views — the
    alternative to the plain mean of train.py:217."""
    w = consistency_weights(grads, temperature)              # (V,N)
    return jnp.einsum("vn,vnc->nc", w, grads)
