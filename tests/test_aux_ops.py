import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.ops import image_metrics, knn, sh, ssim


@pytest.fixture
def imgs(rng):
    a = rng.random((2, 3, 48, 56)).astype(np.float32)
    # correlated second image
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def _torch_ssim(img1, img2):
    """The reference python SSIM (loss_utils.py:257-300) in numpy/scipy."""
    from scipy.signal import convolve2d
    x = np.arange(11) - 5
    g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    g = g / g.sum()
    w = np.outer(g, g)

    def conv(im):
        out = np.empty_like(im)
        for n in range(im.shape[0]):
            for c in range(im.shape[1]):
                out[n, c] = convolve2d(im[n, c], w, mode="same",
                                       boundary="fill")
        return out

    mu1, mu2 = conv(img1), conv(img2)
    s11 = conv(img1 * img1) - mu1 ** 2
    s22 = conv(img2 * img2) - mu2 ** 2
    s12 = conv(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (s11 + s22 + C2))
    return m.mean()


def test_ssim_matches_reference_conv(imgs):
    a, b = imgs
    ours = float(ssim.ssim(a, b))
    ref = _torch_ssim(np.asarray(a), np.asarray(b))
    assert np.isclose(ours, ref, atol=2e-3)  # border handling differs
    assert 0.5 < ours < 1.0


def test_fused_ssim_matches_plain_interior(imgs):
    a, b = imgs
    m_plain = float(ssim.ssim(a, b))
    m_fused = float(ssim.fused_ssim(a, b, padding="same"))
    assert np.isclose(m_plain, m_fused, atol=1e-6)
    # valid padding crops the border
    m_valid = float(ssim.fused_ssim(a, b, padding="valid"))
    assert 0.3 < m_valid <= 1.0


def test_fused_ssim_custom_vjp_matches_autodiff(imgs):
    a, b = imgs

    def via_fused(x):
        return ssim.fused_ssim(x, b)

    def via_autodiff(x):
        return ssim.ssim(x, b)

    g1 = jax.grad(via_fused)(a)
    g2 = jax.grad(via_autodiff)(a)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_fused_ssim_gradient_sanity(imgs):
    """fused-ssim tests/train_image.py analogue: gradient ascent on SSIM
    drives a random image toward the target."""
    a, b = imgs
    x = jnp.asarray(np.random.default_rng(1).random(np.asarray(b).shape,
                                                    ).astype(np.float32))
    val_grad = jax.jit(jax.value_and_grad(lambda x: ssim.fused_ssim(x, b)))
    s0, _ = val_grad(x)
    for _ in range(60):
        s, g = val_grad(x)
        x = jnp.clip(x + 0.25 * g / (jnp.abs(g).max() + 1e-8), 0, 1)
    s1, _ = val_grad(x)
    assert float(s1) > float(s0) + 0.1


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(0, 1, (257, 3)).astype(np.float32)
    ours = np.asarray(knn.dist2_mean3nn(jnp.asarray(pts)))
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    assert np.allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # tiling independence
    ours_small_tile = np.asarray(knn.knn_mean_sq_dist(jnp.asarray(pts),
                                                      tile=64))
    assert np.allclose(ours_small_tile, ref, rtol=1e-4, atol=1e-5)


def test_sh_deg0_and_roundtrip(rng):
    rgb = jnp.asarray(rng.random((5, 3)).astype(np.float32))
    sh0 = sh.RGB2SH(rgb)
    assert np.allclose(np.asarray(sh.SH2RGB(sh0)), np.asarray(rgb), atol=1e-6)
    # deg0 eval: C0·sh + nothing; reference adds 0.5 outside eval_sh
    shs = sh0[..., None]
    dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.eval_sh(0, shs, dirs)
    assert np.allclose(np.asarray(out + 0.5), np.asarray(rgb), atol=1e-6)


def test_sh_higher_degrees_finite(rng):
    for deg in (1, 2, 3):
        n_coeff = (deg + 1) ** 2
        shs = jnp.asarray(rng.normal(size=(4, 3, n_coeff)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(deg, shs, dirs)
        assert out.shape == (4, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_psnr_identity(imgs):
    a, _ = imgs
    p = np.asarray(image_metrics.psnr(a, a))
    assert np.all(p > 80)
    p2 = np.asarray(image_metrics.psnr(a, jnp.clip(a + 0.1, 0, 1)))
    assert np.all(p2 < 30)


def test_loss_domain_equals_cropped(rng):
    """Every registry loss with ``domain=(w,h)`` on zero-padded (C,H,W)
    inputs must equal the plain loss on the cropped true-size inputs — the
    reference computes per-view at the true image size (H36M rigs mix
    1000/1002-wide cameras, padded to one static shape here)."""
    from skelsplat_tpu import losses as L

    C, ht, wt, H, W = 3, 40, 37, 48, 48
    render = np.zeros((C, H, W), np.float32)
    gt = np.zeros((C, H, W), np.float32)
    render[:, :ht, :wt] = rng.random((C, ht, wt))
    gt[:, :ht, :wt] = rng.random((C, ht, wt))
    # sparsify so the union-of-support masks are nontrivial
    render[render < 0.7] = 0.0
    gt[gt < 0.7] = 0.0
    gt_2d = (rng.random((C, 2)) * [wt, ht]).astype(np.float32)

    for name, fn in L.losses.items():
        full, _ = fn(jnp.asarray(render), jnp.asarray(gt),
                     jnp.asarray(gt_2d), 0.3, reduction="mean",
                     domain=(wt, ht))
        crop, _ = fn(jnp.asarray(render[:, :ht, :wt]),
                     jnp.asarray(gt[:, :ht, :wt]),
                     jnp.asarray(gt_2d), 0.3, reduction="mean")
        np.testing.assert_allclose(np.asarray(full), np.asarray(crop),
                                   rtol=2e-5, atol=2e-5, err_msg=name)
