"""Covariance-confidence analysis (ports of utils/analize_2D_anisotropy.py
and utils/analize_error_confidence_correlation.py — offline paper-analysis
utilities)."""

from __future__ import annotations

import numpy as np

from skelsplat_tpu.data import ply


def percent_inside_sigmas(means, covs, gt, ks=(1, 2, 3)):
    """Fraction of GT joints whose Mahalanobis distance from the optimized
    Gaussian is ≤ k, per k (analize_2D_anisotropy.py:7-31)."""
    means = np.asarray(means)
    covs = np.asarray(covs)
    gt = np.asarray(gt)
    inv_covs = np.linalg.inv(covs)
    deltas = gt - means
    d2 = np.einsum("ni,nij,nj->n", deltas, inv_covs, deltas)
    return {k: float(np.sum(d2 <= k ** 2) / means.shape[0]) for k in ks}


def percent_inside_sigmas_per_joint(means, covs, gt, joint_names,
                                    ks=(1, 2, 3)):
    """Per-joint k-sigma coverage over a batch of scenes
    (analize_error_confidence_correlation.py:86-113): means/gt are
    (N, J, 3), covs (N, J, 3, 3); returns
    dict[joint_name][k] = fraction of the N scenes whose GT joint lies
    inside the optimized Gaussian's k-sigma ellipsoid."""
    means = np.asarray(means)
    covs = np.asarray(covs)
    gt = np.asarray(gt)
    deltas = gt - means                                   # (N,J,3)
    inv_covs = np.linalg.inv(covs)                        # (N,J,3,3)
    d2 = np.einsum("nji,njik,njk->nj", deltas, inv_covs, deltas)
    out = {}
    for j, name in enumerate(joint_names):
        out[name] = {k: float(np.mean(d2[:, j] <= k ** 2)) for k in ks}
    return out


def gaussian_cov_from_ply(path):
    """Load an optimized result cloud and reconstruct (means, covs, scales)
    from the raw PLY parameters."""
    import jax.numpy as jnp

    from skelsplat_tpu.core import geometry

    g = ply.read_gaussian_ply(path)
    cov6 = geometry.build_cov3d(jnp.exp(jnp.asarray(g["log_scales"])),
                                jnp.asarray(g["quats"]))
    covs = np.asarray(geometry.unpack_cov6(cov6))
    return g["xyz"], covs, np.exp(g["log_scales"])


def error_confidence_correlation(ply_paths, gt_poses):
    """Per-scene (MPJPE, mean-sigma) pairs + Pearson correlation — the
    error/confidence analysis of
    analize_error_confidence_correlation.py:analyze_error_confidence_correlation."""
    errors, confidences = [], []
    for path, gt in zip(ply_paths, gt_poses):
        means, covs, scales = gaussian_cov_from_ply(path)
        err = np.linalg.norm(means - np.asarray(gt), axis=1).mean()
        conf = np.sqrt(np.trace(covs, axis1=1, axis2=2) / 3).mean()
        errors.append(err)
        confidences.append(conf)
    errors = np.asarray(errors)
    confidences = np.asarray(confidences)
    if errors.size > 1 and errors.std() > 0 and confidences.std() > 0:
        corr = float(np.corrcoef(errors, confidences)[0, 1])
    else:
        corr = float("nan")
    return {"errors": errors, "confidences": confidences,
            "correlation": corr}


def anisotropy_per_joint(lambdas):
    """Per-joint per-view 2D anisotropy λmax/λmin from a lambdas mapping
    {joint_id: [(λ1, λ2), ...]} — the statistic of
    analize_2D_anisotropy.py:34-54 (compute_confidence_per_joint, minus
    the print loop)."""
    out = {}
    for joint_id, view_lambdas in lambdas.items():
        out[joint_id] = [float(max(l1, l2) / min(l1, l2))
                         for l1, l2 in view_lambdas]
    return out


def scene_lambdas(params, cameras, W, H):
    """The ``lambdas.json`` producer the reference never ships: per-joint
    per-view eigenvalues (λ1 ≥ λ2) of the dilated 2D heatmap covariance
    (the EWA heatmap convention, general_utils.py:252-265) for one scene's
    optimized Gaussians. Returns {joint_id: [(λ1, λ2), ...views]} feeding
    ``anisotropy_per_joint``."""
    import jax
    import jax.numpy as jnp

    from skelsplat_tpu.core import geometry

    cov6 = params.covariance()

    def one_view(cam):
        def one_joint(mean3d, c6):
            cov2d = geometry.ewa_cov2d_heatmap(
                mean3d, c6, cam.view4, cam.focal_x, cam.focal_y,
                cam.tan_fovx, cam.tan_fovy)
            s1, s2 = geometry.heatmap_sigmas(cov2d)
            return s1 * s1, s2 * s2          # λ = σ²
        return jax.vmap(one_joint)(params.xyz, cov6)

    l1, l2 = jax.vmap(one_view)(cameras)     # (V, N) each
    l1, l2 = np.asarray(l1), np.asarray(l2)
    n = l1.shape[1]
    return {str(j): [(float(l1[v, j]), float(l2[v, j]))
                     for v in range(l1.shape[0])] for j in range(n)}
