"""Image metrics (port of utils/image_utils.py)."""

import jax.numpy as jnp


def mse(img1, img2):
    return ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(
        axis=1, keepdims=True)


def psnr(img1, img2):
    m = mse(img1, img2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(m))
