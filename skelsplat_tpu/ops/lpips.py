"""LPIPS (Learned Perceptual Image Patch Similarity) — JAX port of
lpipsPyTorch/ (never imported by the reference entry points; provided for
surface parity with the eval extras).

Architecture-faithful to lpipsPyTorch/modules/lpips.py: a frozen backbone's
per-stage features are unit-normalized along channels, squared-differenced,
passed through 1×1 "LinLayers" and spatially averaged; the per-stage scores
sum to the distance. Pretrained weights cannot be downloaded in this
environment (zero egress), so construction takes a weight file:

* ``LPIPS.from_npz(path)`` — backbone + linear weights exported to npz
  (see ``export_torch_weights`` for the converter from the torch
  checkpoints used by the reference);
* without weights, ``lpips`` raises a clear error rather than silently
  producing meaningless distances.

Only the VGG16 backbone is implemented (the variant the 3DGS ecosystem
evaluates with); alex/squeeze weights can be exported to the same npz schema.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature-extractor config up to conv5_3 (torchvision layout), split
# into the 5 LPIPS stages after each relu block.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512]
VGG16_STAGES = (1, 3, 6, 9, 12)  # convs closing relu1_2,2_2,3_3,4_3,5_3
N_CHANNELS = [64, 128, 256, 512, 512]

# ImageNet normalization used by lpipsPyTorch/modules/networks.py
_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_STD = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    """Functional LPIPS with explicit weights pytree."""

    def __init__(self, weights: dict):
        self.weights = jax.tree.map(jnp.asarray, weights)

    # ------------------------------------------------------------------
    @classmethod
    def from_npz(cls, path: str) -> "LPIPS":
        data = np.load(path)
        conv_w = [data[f"conv{i}_w"] for i in
                  range(len([c for c in VGG16_CFG if c != "M"]))]
        conv_b = [data[f"conv{i}_b"] for i in range(len(conv_w))]
        lin_w = [data[f"lin{i}_w"] for i in range(5)]
        return cls({"conv_w": conv_w, "conv_b": conv_b, "lin_w": lin_w})

    @staticmethod
    def export_torch_weights(out_path: str, net_type: str = "vgg"):
        """Convert the reference's torch checkpoints (torchvision VGG16 +
        the LPIPS v0.1 LinLayer state dict) to the npz schema. Requires
        torchvision + the downloaded checkpoints; run where network access
        exists."""
        import torch
        import torchvision

        assert net_type == "vgg", "only vgg export implemented"
        vgg = torchvision.models.vgg16(weights="DEFAULT").features
        convs = [m for m in vgg if isinstance(m, torch.nn.Conv2d)]
        out = {}
        for i, m in enumerate(convs):
            out[f"conv{i}_w"] = m.weight.detach().numpy()
            out[f"conv{i}_b"] = m.bias.detach().numpy()
        url = ("https://raw.githubusercontent.com/richzhang/"
               "PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth")
        sd = torch.hub.load_state_dict_from_url(url, progress=True,
                                                map_location="cpu")
        for i in range(5):
            key = f"lin{i}.model.1.weight"
            out[f"lin{i}_w"] = sd[key].detach().numpy()
        np.savez(out_path, **out)

    # ------------------------------------------------------------------
    def _features(self, x):
        """x: (B,3,H,W) in [-1,1] (lpips convention). Returns the 5
        unit-normalized stage features."""
        x = (x - jnp.asarray(_MEAN)[None, :, None, None]) \
            / jnp.asarray(_STD)[None, :, None, None]
        feats = []
        ci = 0
        h = x
        for item in VGG16_CFG:
            if item == "M":
                h = -jax.lax.reduce_window(
                    -h, jnp.inf, jax.lax.min, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
                continue
            w = self.weights["conv_w"][ci]
            b = self.weights["conv_b"][ci]
            dn = jax.lax.conv_dimension_numbers(h.shape, w.shape,
                                                ("NCHW", "OIHW", "NCHW"))
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
            h = h + b[None, :, None, None]
            h = jax.nn.relu(h)
            if ci in VGG16_STAGES:
                norm = jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True))
                feats.append(h / (norm + 1e-10))
            ci += 1
        return feats

    def __call__(self, x, y):
        """(B,3,H,W) images in [-1,1] → (B,) LPIPS distances
        (lpips.py:31-37)."""
        fx = self._features(x)
        fy = self._features(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (a - b) ** 2
            w = self.weights["lin_w"][i]          # (1, C, 1, 1)
            score = jnp.sum(d * jnp.reshape(w, (1, -1, 1, 1)), axis=1)
            total = total + jnp.mean(score, axis=(1, 2))
        return total


def lpips(x, y, net_type: str = "vgg", version: str = "0.1",
          weights_path: str | None = None):
    """Drop-in for lpipsPyTorch.lpips (lpipsPyTorch/__init__.py)."""
    if weights_path is None:
        raise RuntimeError(
            "LPIPS needs pretrained weights; export them with "
            "LPIPS.export_torch_weights(...) on a machine with network "
            "access and pass weights_path=")
    model = LPIPS.from_npz(weights_path)
    return model(x, y)
