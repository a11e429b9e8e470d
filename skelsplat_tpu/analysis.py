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
