"""Per-view gradient consistency / confidence weighting (full port of
utils/similarity_utils.py:9-205).

Analysis-only in the reference (never imported by its entry points; it
implements the paper's per-view confidence weighting ideas), but ported
completely and vectorized: the reference's per-joint / per-pair python
loops become batched jnp over the (V, N, D) per-view gradient stack the
trainer's vmapped backward already produces — one fused XLA program
instead of N·V²/2 tiny kernels.

The trainer exposes the weighting live via
``training.view_fusion=confidence_weighted`` (off by default: the
reference's shipped behavior is the plain mean of train.py:215-218).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_cosine_similarity(gradients, eps: float = 1e-8):
    """(V, N, D) per-view gradients → (N, V, V) pairwise cosine similarity
    between views per joint, diagonal forced to 1
    (similarity_utils.py:9-27). Each view's gradient is normalized by its
    own norm + eps before the dot products."""
    g = jnp.transpose(gradients, (1, 0, 2))                  # (N,V,D)
    gn = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + eps)
    # precision=HIGHEST: this feeds the live optimizer step on TPU, where
    # the default bf16 matmul path would drift ~0.3% vs the f32 oracles
    sim = jnp.einsum("nvc,nwc->nvw", gn, gn,
                     precision=jax.lax.Precision.HIGHEST)
    v = sim.shape[-1]
    eye = jnp.eye(v, dtype=bool)
    return jnp.where(eye[None], 1.0, sim)


def pairwise_cosine_norm_similarity(gradients, w1: float = 0.2,
                                    w2: float = 0.8, eps: float = 1e-8):
    """(V, N, D) → (N, V, V) blended similarity
    (similarity_utils.py:30-64): per joint, gradients are normalized by the
    SUM of the per-view norms (when positive), then each pair scores

        w1 · cos(g1, g2) − w2 · |‖g1‖−‖g2‖| / (max(‖g1‖, ‖g2‖) + eps)

    — agreement in direction minus disagreement in magnitude. Diagonal
    forced to 1."""
    g = jnp.transpose(gradients, (1, 0, 2))                  # (N,V,D)
    total = jnp.sum(jnp.linalg.norm(g, axis=-1), axis=-1)    # (N,)
    g = jnp.where(total[:, None, None] > 0,
                  g / jnp.where(total == 0, 1.0, total)[:, None, None], g)

    n = jnp.linalg.norm(g, axis=-1)                          # (N,V)
    dots = jnp.einsum("nvc,nwc->nvw", g, g,
                      precision=jax.lax.Precision.HIGHEST)
    cos = dots / (n[:, :, None] * n[:, None, :] + eps)
    rel = (jnp.abs(n[:, :, None] - n[:, None, :])
           / (jnp.maximum(n[:, :, None], n[:, None, :]) + eps))
    score = w1 * cos - w2 * rel
    v = score.shape[-1]
    eye = jnp.eye(v, dtype=bool)
    return jnp.where(eye[None], 1.0, score)


def identify_consistent_views(pairwise_similarity, threshold: float = 0.5):
    """(N, V, V) similarity → (N, V) bool: a view is consistent when it
    agrees (similarity ≥ threshold) with at least 2 OTHER views
    (similarity_utils.py:68-79; the −1 removes the diagonal self-match)."""
    agree = (pairwise_similarity >= threshold).sum(axis=-1) - 1
    return agree >= 2


def weight_function(s):
    """Piecewise confidence map (similarity_utils.py:171-187):
    linear 0.8·(s+1) on [−1, 0), logarithmic 0.54·log₃(s+2) + 0.46 on
    [0, 1], zero outside [−1, 1]."""
    s = jnp.asarray(s)
    log_part = 0.54 * (jnp.log(s + 2.0) / jnp.log(3.0)) + 0.46
    lin_part = 0.8 * (s + 1.0)
    out = jnp.zeros_like(s)
    out = jnp.where((s >= -1) & (s < 0), lin_part, out)
    out = jnp.where((s >= 0) & (s <= 1), log_part, out)
    return out


def compute_scaling_weights(similarity_matrix, n_other: int | None = None):
    """(N, V, V) similarity → (V, N) per-view confidence weights
    (similarity_utils.py:159-168): mean off-diagonal similarity per view,
    mapped through ``weight_function`` and transposed.

    The reference divides by a hardcoded 3 (its 4-camera H36M rig);
    ``n_other`` defaults to V−1, which equals it there and generalizes to
    other rigs. Pass ``n_other=3`` for the literal reference behavior on
    any V."""
    v = similarity_matrix.shape[-1]
    if n_other is None:
        n_other = max(v - 1, 1)
    diag = jnp.diagonal(similarity_matrix, axis1=-2, axis2=-1)    # (N,V)
    sims = (similarity_matrix.sum(axis=-1) - diag) / n_other
    return jnp.transpose(weight_function(sims), (1, 0))           # (V,N)


def select_views(error_matrix, threshold: float = 2.5, min_views: int = 4):
    """(V, J) per-view per-joint error → view selection
    (similarity_utils.py:190-205). Returns the reference's triple:

    * ``selected_views`` (V, J) bool — error ≤ threshold, with columns
      having fewer than ``min_views`` hits back-filled with that joint's
      ``min_views`` lowest-error views;
    * ``best_views`` (min_views,) — views ranked by how many joints
      selected them, ties broken by lower view index;
    * ``final_matrix`` (V, J) bool — the best views' rows set True.
    """
    err = jnp.asarray(error_matrix)
    v, j = err.shape
    selected = err <= threshold
    # rank of each view within its joint column by ascending error
    order = jnp.argsort(err, axis=0)                          # (V,J)
    ranks = jnp.argsort(order, axis=0)
    needs_fill = selected.sum(axis=0) < min_views             # (J,)
    selected = selected | (needs_fill[None, :] & (ranks < min_views))

    view_scores = selected.sum(axis=1)                        # (V,)
    best_views = jnp.argsort(-view_scores, stable=True)[:min_views]
    final = jnp.zeros((v, j), bool).at[best_views].set(True)
    return selected, best_views, final


def confidence_weighted_mean(gradients, w1: float = 0.2, w2: float = 0.8,
                             eps: float = 1e-8):
    """(V, N, D) per-view gradients → (N, D): confidence-weighted mean over
    views — the live alternative to train.py:215-218's plain mean
    (``training.view_fusion=confidence_weighted``).

    Weights come from the reference's own pipeline (blended similarity →
    ``compute_scaling_weights``); the weighted sum is normalized by the
    weight total so all-equal weights reduce exactly to the plain mean, and
    an all-zero weight column (every view maximally inconsistent) falls
    back to the plain mean rather than dividing by zero."""
    sim = pairwise_cosine_norm_similarity(gradients, w1, w2, eps)
    w = compute_scaling_weights(sim)                          # (V,N)
    tot = jnp.sum(w, axis=0)                                  # (N,)
    weighted = jnp.einsum(
        "vn,vnd->nd", w, gradients,
        precision=jax.lax.Precision.HIGHEST) / jnp.where(
        tot == 0, 1.0, tot)[:, None]
    mean = jnp.mean(gradients, axis=0)
    return jnp.where((tot == 0)[:, None], mean, weighted)


# --- additive conveniences (not in the reference) -------------------------

def view_consistency_scores(grads, eps: float = 1e-8):
    """(V,N,3) → (N,V): mean cosine similarity of each view's gradient to
    the other views' (diagonal excluded) — a per-view agreement score."""
    sim = pairwise_cosine_similarity(grads, eps)              # (N,V,V)
    v = sim.shape[-1]
    off = sim - jnp.eye(v)[None]
    return jnp.sum(off, axis=-1) / jnp.maximum(v - 1, 1)


def select_consistent_views(grads, k: int, eps: float = 1e-8):
    """(V,N,3) → (N,k) indices of the k most agreeing views per joint."""
    scores = view_consistency_scores(grads, eps)              # (N,V)
    return jnp.argsort(-scores, axis=-1)[:, :k]
