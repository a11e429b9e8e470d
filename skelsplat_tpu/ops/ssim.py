"""Differentiable SSIM — TPU equivalent of the fused-ssim CUDA extension.

Two variants, matching the reference's two implementations:

* ``ssim`` — the plain convolutional SSIM of utils/loss_utils.py:257-300
  (11×11 Gaussian window, σ=1.5, same-padding depthwise conv).
* ``fused_ssim`` / ``FusedSSIM`` — the fused-ssim package
  (submodules/fused-ssim/ssim.cu): hardcoded 11×11 σ=1.5 separable window
  (ssim.cu:9-19), "same" or "valid" padding, and a custom VJP implementing
  the cached-partials backward — the forward saves ∂ssim/∂μ1, ∂ssim/∂σ1²,
  ∂ssim/∂σ12 and the backward is three more separable convolutions of the
  incoming cotangent with those maps (ssim.cu:186-365). On TPU the separable
  convolutions lower to XLA depthwise convs that fuse well; the custom VJP
  preserves the reference's memory/compute trade (no autodiff through the
  statistics recomputation).

C1/C2 use the standard (0.01², 0.03²) constants (ssim.cu wrapper,
fused_ssim/__init__.py:8-41).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01 ** 2
C2 = 0.03 ** 2
WINDOW = 11
SIGMA = 1.5


def _gaussian_window(window_size=WINDOW, sigma=SIGMA):
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _sep_conv(x, w1d, padding):
    """Depthwise separable 2D convolution of NCHW with a 1D window applied
    along H then W."""
    C = x.shape[1]
    kh = w1d.reshape(1, 1, -1, 1)
    kw = w1d.reshape(1, 1, 1, -1)
    kh = jnp.broadcast_to(kh, (C, 1, w1d.shape[0], 1))
    kw = jnp.broadcast_to(kw, (C, 1, 1, w1d.shape[0]))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    if padding == "same":
        pad = w1d.shape[0] // 2
        pads_h = [(pad, pad), (0, 0)]
        pads_w = [(0, 0), (pad, pad)]
    else:
        pads_h = [(0, 0), (0, 0)]
        pads_w = [(0, 0), (0, 0)]
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), pads_h,
                                     dimension_numbers=dn,
                                     feature_group_count=C,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), pads_w,
                                     dimension_numbers=dn,
                                     feature_group_count=C,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_stats(img1, img2, padding):
    w = _gaussian_window()
    mu1 = _sep_conv(img1, w, padding)
    mu2 = _sep_conv(img2, w, padding)
    s11 = _sep_conv(img1 * img1, w, padding) - mu1 * mu1
    s22 = _sep_conv(img2 * img2, w, padding) - mu2 * mu2
    s12 = _sep_conv(img1 * img2, w, padding) - mu1 * mu2
    return mu1, mu2, s11, s22, s12


def ssim(img1, img2, window_size=11, size_average=True):
    """utils/loss_utils.py:269-300 (2D Gaussian window, same padding).

    Accepts CHW or NCHW float images in [0,1].
    """
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    mu1, mu2, s11, s22, s12 = _ssim_stats(img1, img2, "same")
    num = (2 * mu1 * mu2 + C1) * (2 * s12 + C2)
    den = (mu1 * mu1 + mu2 * mu2 + C1) * (s11 + s22 + C2)
    ssim_map = num / den
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# fused-ssim equivalent with cached-partials custom VJP
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_ssim_map(img1, img2, padding="same"):
    """The SSIM map with gradients flowing to img1 only (like the CUDA
    FusedSSIMMap: backward returns grads for img1, ssim.cu ext +
    fused_ssim/__init__.py:8-30)."""
    mu1, mu2, s11, s22, s12 = _ssim_stats(img1, img2, padding)
    A1 = 2 * mu1 * mu2 + C1
    A2 = 2 * s12 + C2
    B1 = mu1 * mu1 + mu2 * mu2 + C1
    B2 = s11 + s22 + C2
    return (A1 * A2) / (B1 * B2)


def _fused_fwd(img1, img2, padding):
    mu1, mu2, s11, s22, s12 = _ssim_stats(img1, img2, padding)
    A1 = 2 * mu1 * mu2 + C1
    A2 = 2 * s12 + C2
    B1 = mu1 * mu1 + mu2 * mu2 + C1
    B2 = s11 + s22 + C2
    m = (A1 * A2) / (B1 * B2)
    # cached partials (ssim.cu:274-283), from m = A1·A2 / (B1·B2):
    #   ∂m/∂μ1 = (2μ2·A2·B1 − 2μ1·A1·A2) / (B1²·B2)
    dm_dmu1 = (2 * mu2 * A2 * B1 - A1 * A2 * 2 * mu1) / (B1 * B1 * B2)
    dm_dsigma1_sq = -(A1 * A2) / (B1 * B2 * B2)
    dm_dsigma12 = (2 * A1) / (B1 * B2)
    return m, (img1, img2, mu1, mu2, dm_dmu1, dm_dsigma1_sq, dm_dsigma12)


def _fused_bwd(padding, res, g):
    img1, img2, mu1, mu2, dm_dmu1, dm_dsigma1_sq, dm_dsigma12 = res
    w = _gaussian_window()
    # backward = three separable convolutions of (g × cached partials)
    # (ssim.cu:288-365). With valid padding the cotangent lives on the
    # cropped grid; scatter it back by zero-padding before the transposed
    # (= same, symmetric window) convolution.
    if padding == "valid":
        pad = WINDOW // 2
        padcfg = [(0, 0), (0, 0), (pad, pad), (pad, pad)]
        g = jnp.pad(g, padcfg)
        c1 = _sep_conv(g * jnp.pad(dm_dmu1 - 2 * mu1 * dm_dsigma1_sq
                                   - mu2 * dm_dsigma12, padcfg), w, "same")
        c2 = _sep_conv(g * jnp.pad(2 * dm_dsigma1_sq, padcfg), w, "same")
        c3 = _sep_conv(g * jnp.pad(dm_dsigma12, padcfg), w, "same")
    else:
        c1 = _sep_conv(g * (dm_dmu1 - 2 * mu1 * dm_dsigma1_sq
                            - mu2 * dm_dsigma12), w, "same")
        c2 = _sep_conv(g * (2 * dm_dsigma1_sq), w, "same")
        c3 = _sep_conv(g * dm_dsigma12, w, "same")
    # dL/dimg1 = conv(g·(∂m/∂μ1 − 2μ1·∂m/∂σ1² − μ2·∂m/∂σ12))
    #          + img1·conv(g·2∂m/∂σ1²) + img2·conv(g·∂m/∂σ12)
    dimg1 = c1 + img1 * c2 + img2 * c3
    return dimg1, jnp.zeros_like(img2)


fused_ssim_map.defvjp(_fused_fwd, _fused_bwd)


def fused_ssim(img1, img2, padding="same", train=True):
    """Mean fused SSIM (fused_ssim/__init__.py:33-41). img2 is treated as
    the (non-differentiated) reference image."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    m = fused_ssim_map(img1, img2, padding)
    return jnp.mean(m)


def fast_ssim(img1, img2):
    """loss_utils.py:320-322."""
    return fused_ssim(img1, img2, padding="same")
