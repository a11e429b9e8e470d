"""Adaptive density control — functional port of the upstream-3DGS
densification machinery (gaussian_model.py:374-498).

Vestigial in the SkelSplat path (train.py never calls it — the skeleton has
exactly one Gaussian per joint), but part of the framework surface for
general splatting workloads. The reference mutates the torch optimizer's
state in place (cat/prune of exp_avg tensors); here the same operations are
pure functions over (GaussianParams, AdamState, aux) with explicit outputs.

JAX note: clone/split/prune change N, which is shape-dynamic. These
functions are host-side (numpy in, numpy out) by design — densification is
a between-step restructuring, not a hot-loop op; the returned arrays re-jit
the step functions at the new N (or are padded to a static budget by the
caller).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from skelsplat_tpu.core import geometry
from skelsplat_tpu.core.gaussians import GaussianParams
from skelsplat_tpu.engine.optim import AdamState


@dataclasses.dataclass
class DensifyAux:
    """xyz_gradient_accum / denom / max_radii2D (gaussian_model.py:60-62)."""

    xyz_gradient_accum: np.ndarray   # (N,1)
    denom: np.ndarray                # (N,1)
    max_radii2D: np.ndarray          # (N,)

    @classmethod
    def zeros(cls, n):
        return cls(np.zeros((n, 1), np.float32), np.zeros((n, 1), np.float32),
                   np.zeros((n,), np.float32))


def _np_params(params: GaussianParams) -> dict:
    return {k: np.asarray(getattr(params, k))
            for k in ("xyz", "log_scales", "quats", "opacity_logit")}


def _mk_params(d: dict) -> GaussianParams:
    import jax.numpy as jnp
    return GaussianParams(**{k: jnp.asarray(v) for k, v in d.items()})


def _np_state(state: AdamState) -> tuple[dict, dict, int]:
    m = {k: np.asarray(getattr(state.m, k))
         for k in ("xyz", "log_scales", "quats", "opacity_logit")}
    v = {k: np.asarray(getattr(state.v, k))
         for k in ("xyz", "log_scales", "quats", "opacity_logit")}
    return m, v, int(np.asarray(state.t))


def _mk_state(m: dict, v: dict, t: int) -> AdamState:
    import jax.numpy as jnp
    return AdamState(m=_mk_params({k: jnp.asarray(x) for k, x in m.items()}),
                     v=_mk_params({k: jnp.asarray(x) for k, x in v.items()}),
                     t=jnp.asarray(t, jnp.int32))


def add_densification_stats(aux: DensifyAux, viewspace_grad, radii,
                            visibility) -> DensifyAux:
    """gaussian_model.py:496-498: accumulate screen-space gradient norms of
    visible Gaussians."""
    vg = np.asarray(viewspace_grad)
    vis = np.asarray(visibility)
    norm = np.linalg.norm(vg[:, :2], axis=-1, keepdims=True)
    acc = aux.xyz_gradient_accum.copy()
    den = aux.denom.copy()
    acc[vis] += norm[vis]
    den[vis] += 1
    maxr = np.maximum(aux.max_radii2D, np.asarray(radii) * vis)
    return DensifyAux(acc, den, maxr)


def densify_and_prune(params: GaussianParams, state: AdamState,
                      aux: DensifyAux, max_grad: float, min_opacity: float,
                      extent: float, max_screen_size, radii,
                      percent_dense: float = 0.01, rng=None):
    """gaussian_model.py:477-494: clone small high-grad Gaussians, split
    large ones, prune transparent/oversized ones. Returns
    (params, state, aux)."""
    rng = rng or np.random.default_rng(0)
    p = _np_params(params)
    m, v, t = _np_state(state)

    grads = aux.xyz_gradient_accum / np.maximum(aux.denom, 1e-12)
    grads = np.nan_to_num(grads, nan=0.0)
    g1 = np.linalg.norm(grads, axis=-1)
    scales = np.exp(p["log_scales"])
    max_scale = scales.max(axis=1)
    radii = np.asarray(radii, np.float32)

    # --- clone (gaussian_model.py:460-475): high grad, small scale ---
    clone_mask = (g1 >= max_grad) & (max_scale <= percent_dense * extent)
    # --- split (gaussian_model.py:434-458): high grad, large scale ---
    split_mask = (g1 >= max_grad) & (max_scale > percent_dense * extent)

    def cat(d, mask, transform=None):
        out = {}
        for k, val in d.items():
            sel = val[mask]
            if transform is not None:
                sel = transform(k, sel)
            out[k] = np.concatenate([val, sel], axis=0)
        return out

    # clones copy verbatim; their optimizer state starts at zero
    n0 = p["xyz"].shape[0]
    p2 = cat(p, clone_mask)
    zero_new = lambda k, s: np.zeros_like(s)
    m2 = cat(m, clone_mask, zero_new)
    v2 = cat(v, clone_mask, zero_new)
    radii2 = np.concatenate([radii, radii[clone_mask]])
    split_mask2 = np.concatenate([split_mask,
                                  np.zeros(clone_mask.sum(), bool)])

    # splits: 2 children sampled from the parent's covariance, scales /1.6
    N_SPLIT = 2
    idx = np.nonzero(split_mask2)[0]
    if idx.size:
        parent_scales = np.exp(p2["log_scales"][idx])
        q = p2["quats"][idx]
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        R = np.stack([geometry.qvec2rotmat(qq) for qq in qn])
        children = {k: [] for k in p2}
        mc = {k: [] for k in m2}
        vc = {k: [] for k in v2}
        for _ in range(N_SPLIT):
            samples = rng.normal(0.0, parent_scales)
            new_xyz = np.einsum("nij,nj->ni", R, samples) + p2["xyz"][idx]
            children["xyz"].append(new_xyz.astype(np.float32))
            children["log_scales"].append(
                np.log(parent_scales / (0.8 * N_SPLIT)).astype(np.float32))
            children["quats"].append(p2["quats"][idx])
            children["opacity_logit"].append(p2["opacity_logit"][idx])
            for k in m2:
                mc[k].append(np.zeros_like(m2[k][idx]))
                vc[k].append(np.zeros_like(v2[k][idx]))
        p2 = {k: np.concatenate([p2[k]] + children[k]) for k in p2}
        m2 = {k: np.concatenate([m2[k]] + mc[k]) for k in m2}
        v2 = {k: np.concatenate([v2[k]] + vc[k]) for k in v2}
        radii2 = np.concatenate([radii2] + [radii2[idx]] * N_SPLIT)
        # prune the split parents (gaussian_model.py:457-458)
        parent_prune = np.zeros(p2["xyz"].shape[0], bool)
        parent_prune[idx] = True
    else:
        parent_prune = np.zeros(p2["xyz"].shape[0], bool)

    # --- prune (gaussian_model.py:485-490) ---
    opacity = 1.0 / (1.0 + np.exp(-p2["opacity_logit"][:, 0]))
    prune = parent_prune | (opacity < min_opacity)
    if max_screen_size:
        big_vs = radii2 > max_screen_size
        big_ws = np.exp(p2["log_scales"]).max(axis=1) > 0.1 * extent
        prune |= big_vs | big_ws
    keep = ~prune
    p2 = {k: val[keep] for k, val in p2.items()}
    m2 = {k: val[keep] for k, val in m2.items()}
    v2 = {k: val[keep] for k, val in v2.items()}

    n_new = p2["xyz"].shape[0]
    return (_mk_params(p2), _mk_state(m2, v2, t),
            DensifyAux.zeros(n_new))


def reset_opacity(params: GaussianParams, state: AdamState):
    """gaussian_model.py:283-286: clamp opacity to ≤ 0.01 and zero the
    opacity optimizer state."""
    import jax.numpy as jnp

    p = _np_params(params)
    m, v, t = _np_state(state)
    opa = 1.0 / (1.0 + np.exp(-p["opacity_logit"]))
    new = np.minimum(opa, 0.01)
    p["opacity_logit"] = np.log(new / (1 - new)).astype(np.float32)
    m["opacity_logit"] = np.zeros_like(m["opacity_logit"])
    v["opacity_logit"] = np.zeros_like(v["opacity_logit"])
    return _mk_params(p), _mk_state(m, v, t)
