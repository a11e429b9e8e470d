"""LPIPS (Learned Perceptual Image Patch Similarity) — JAX port of
lpipsPyTorch/ (never imported by the reference entry points; provided for
surface parity with the eval extras).

Architecture-faithful to lpipsPyTorch/modules/lpips.py + networks.py: a
frozen backbone's per-stage features are unit-normalized along channels,
squared-differenced, passed through 1×1 "LinLayers" and spatially averaged;
the per-stage scores sum to the distance. All three reference backbones are
implemented — VGG16 (networks.py:88-97), AlexNet (:77-85) and
SqueezeNet 1.1 (:66-74) — as explicit layer specs mirroring the torchvision
feature extractors module-for-module (tap indices = the reference's
``target_layers``).

Pretrained weights cannot be downloaded in this environment (zero egress),
so construction takes a weight file:

* ``LPIPS.from_npz(path)`` — backbone + linear weights exported to npz
  (see ``export_torch_weights`` for the converter from the torch
  checkpoints used by the reference; run it on a networked machine);
* ``random_weights(net_type, seed)`` — correctly-shaped random weights
  (documents the npz schema; the architecture is verified against a torch
  oracle with these in tests/test_lpips.py);
* without weights, ``lpips`` raises a clear error rather than silently
  producing meaningless distances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Layer specs mirror torchvision's .features module lists one-to-one so the
# reference's 1-based ``target_layers`` indices apply directly.
#   ("conv", out_c, kernel, stride, pad) / ("relu",) / ("maxpool", k, s)
#   ("fire", squeeze_c, expand1x1_c, expand3x3_c)   (squeezenet1_1)
_C = lambda o, k, s=1, p=None: ("conv", o, k, s, k // 2 if p is None else p)
_R = ("relu",)

BACKBONES = {
    "vgg": {
        # torchvision vgg16().features (networks.py:91)
        "layers": [_C(64, 3), _R, _C(64, 3), _R, ("maxpool", 2, 2),
                   _C(128, 3), _R, _C(128, 3), _R, ("maxpool", 2, 2),
                   _C(256, 3), _R, _C(256, 3), _R, _C(256, 3), _R,
                   ("maxpool", 2, 2),
                   _C(512, 3), _R, _C(512, 3), _R, _C(512, 3), _R,
                   ("maxpool", 2, 2),
                   _C(512, 3), _R, _C(512, 3), _R, _C(512, 3), _R],
        "targets": (4, 9, 16, 23, 30),        # networks.py:92
        "n_channels": (64, 128, 256, 512, 512),
    },
    "alex": {
        # torchvision alexnet().features (networks.py:80)
        "layers": [_C(64, 11, 4, 2), _R, ("maxpool", 3, 2),
                   _C(192, 5, 1, 2), _R, ("maxpool", 3, 2),
                   _C(384, 3), _R, _C(256, 3), _R, _C(256, 3), _R,
                   ("maxpool", 3, 2)],
        "targets": (2, 5, 8, 10, 12),          # networks.py:81
        "n_channels": (64, 192, 384, 256, 256),
    },
    "squeeze": {
        # torchvision squeezenet1_1().features (networks.py:69)
        "layers": [_C(64, 3, 2, 0), _R, ("maxpool", 3, 2),
                   ("fire", 16, 64, 64), ("fire", 16, 64, 64),
                   ("maxpool", 3, 2),
                   ("fire", 32, 128, 128), ("fire", 32, 128, 128),
                   ("maxpool", 3, 2),
                   ("fire", 48, 192, 192), ("fire", 48, 192, 192),
                   ("fire", 64, 256, 256), ("fire", 64, 256, 256)],
        "targets": (2, 5, 8, 10, 11, 12, 13),  # networks.py:70
        "n_channels": (64, 128, 256, 384, 384, 512, 512),
    },
}

# ImageNet normalization used by lpipsPyTorch/modules/networks.py:41-43
_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_STD = np.array([0.458, 0.448, 0.450], np.float32)


def _conv_shapes(net_type: str):
    """(out_c, in_c, k, k) for every conv in traversal order (fire modules
    contribute squeeze, expand1x1, expand3x3)."""
    shapes, in_c = [], 3
    for item in BACKBONES[net_type]["layers"]:
        if item[0] == "conv":
            _, o, k, s, p = item
            shapes.append((o, in_c, k, k))
            in_c = o
        elif item[0] == "fire":
            _, sq, e1, e3 = item
            shapes += [(sq, in_c, 1, 1), (e1, sq, 1, 1), (e3, sq, 3, 3)]
            in_c = e1 + e3
    return shapes


class LPIPS:
    """Functional LPIPS with an explicit weights pytree."""

    def __init__(self, weights: dict, net_type: str = "vgg"):
        self.net_type = net_type
        self.weights = jax.tree.map(jnp.asarray, weights)

    # ------------------------------------------------------------------
    @classmethod
    def from_npz(cls, path: str) -> "LPIPS":
        data = np.load(path)
        net_type = str(data["net_type"]) if "net_type" in data else "vgg"
        n_conv = len(_conv_shapes(net_type))
        n_lin = len(BACKBONES[net_type]["targets"])
        return cls({"conv_w": [data[f"conv{i}_w"] for i in range(n_conv)],
                    "conv_b": [data[f"conv{i}_b"] for i in range(n_conv)],
                    "lin_w": [data[f"lin{i}_w"] for i in range(n_lin)]},
                   net_type)

    @staticmethod
    def export_torch_weights(out_path: str, net_type: str = "vgg"):
        """Convert the reference's torch checkpoints (torchvision backbone +
        the LPIPS v0.1 LinLayer state dict, utils.py:11-31) to the npz
        schema. Requires torchvision + network access; run offline and ship
        the npz."""
        import torch
        import torchvision

        features = {
            "vgg": lambda: torchvision.models.vgg16(weights="DEFAULT"),
            "alex": lambda: torchvision.models.alexnet(weights="DEFAULT"),
            "squeeze": lambda: torchvision.models.squeezenet1_1(
                weights="DEFAULT"),
        }[net_type]().features
        convs = [m for m in features.modules()
                 if isinstance(m, torch.nn.Conv2d)]
        out = {"net_type": np.asarray(net_type)}
        for i, m in enumerate(convs):
            out[f"conv{i}_w"] = m.weight.detach().numpy()
            out[f"conv{i}_b"] = m.bias.detach().numpy()
        url = ("https://raw.githubusercontent.com/richzhang/"
               "PerceptualSimilarity/master/lpips/weights/v0.1/"
               f"{net_type}.pth")
        sd = torch.hub.load_state_dict_from_url(url, progress=True,
                                                map_location="cpu")
        # get_state_dict's key rename (utils.py:24-31): lin{i}.model.1.weight
        for i in range(len(BACKBONES[net_type]["targets"])):
            key = f"lin{i}.model.1.weight"
            if key not in sd:  # unrenamed upstream layout
                key = f"lin.{i}.1.weight" if f"lin.{i}.1.weight" in sd \
                    else f"lins.{i}.model.1.weight"
            out[f"lin{i}_w"] = sd[key].detach().numpy()
        np.savez(out_path, **out)

    # ------------------------------------------------------------------
    def _conv(self, h, w, b, stride, pad):
        dn = jax.lax.conv_dimension_numbers(h.shape, w.shape,
                                            ("NCHW", "OIHW", "NCHW"))
        h = jax.lax.conv_general_dilated(
            h, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=dn)
        return h + b[None, :, None, None]

    def _features(self, x):
        """x: (B,3,H,W) in [-1,1] (lpips convention). Returns the per-stage
        unit-normalized features (networks.py:53-62)."""
        x = (x - jnp.asarray(_MEAN)[None, :, None, None]) \
            / jnp.asarray(_STD)[None, :, None, None]
        cfg = BACKBONES[self.net_type]
        cw, cb = self.weights["conv_w"], self.weights["conv_b"]
        feats, ci, h = [], 0, x
        for mod_i, item in enumerate(cfg["layers"], start=1):
            if item[0] == "conv":
                _, o, k, s, p = item
                h = self._conv(h, cw[ci], cb[ci], s, p)
                ci += 1
            elif item[0] == "relu":
                h = jax.nn.relu(h)
            elif item[0] == "maxpool":
                _, k, s = item
                h = -jax.lax.reduce_window(
                    -h, jnp.inf, jax.lax.min, (1, 1, k, k), (1, 1, s, s),
                    "VALID")
            else:  # fire (squeezenet1_1): squeeze→relu, two expands→relu,
                #    channel concat
                sq = jax.nn.relu(self._conv(h, cw[ci], cb[ci], 1, 0))
                e1 = jax.nn.relu(self._conv(sq, cw[ci + 1], cb[ci + 1], 1, 0))
                e3 = jax.nn.relu(self._conv(sq, cw[ci + 2], cb[ci + 2], 1, 1))
                h = jnp.concatenate([e1, e3], axis=1)
                ci += 3
            if mod_i in cfg["targets"]:
                norm = jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True))
                feats.append(h / (norm + 1e-10))   # utils.py:6-8
            if len(feats) == len(cfg["targets"]):
                break
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


def random_weights(net_type: str = "vgg", seed: int = 0) -> dict:
    """Correctly-shaped random weights — the npz schema documented as code.
    Used by the architecture-parity tests (vs a torch oracle); NOT
    perceptually meaningful."""
    rng = np.random.default_rng(seed)
    conv_w, conv_b = [], []
    for shape in _conv_shapes(net_type):
        fan_in = shape[1] * shape[2] * shape[3]
        conv_w.append(rng.normal(0, 1 / np.sqrt(fan_in),
                                 shape).astype(np.float32))
        conv_b.append(rng.normal(0, 0.1, shape[0]).astype(np.float32))
    lin_w = [np.abs(rng.normal(0, 0.05, (1, c, 1, 1))).astype(np.float32)
             for c in BACKBONES[net_type]["n_channels"]]
    return {"conv_w": conv_w, "conv_b": conv_b, "lin_w": lin_w}


def default_weights_path(net_type: str = "vgg") -> str | None:
    """Path of a committed weight npz (ops/lpips_weights/{net}.npz, produced
    by tools/fetch_lpips_weights.py on a networked machine), or None."""
    import os
    path = os.path.join(os.path.dirname(__file__), "lpips_weights",
                        f"{net_type}.npz")
    return path if os.path.exists(path) else None


def lpips(x, y, net_type: str = "vgg", version: str = "0.1",
          weights_path: str | None = None):
    """Drop-in for lpipsPyTorch.lpips (lpipsPyTorch/__init__.py)."""
    if weights_path is None:
        weights_path = default_weights_path(net_type)
    if weights_path is None:
        raise RuntimeError(
            "LPIPS needs pretrained weights; run "
            "python -m skelsplat_tpu.tools.fetch_lpips_weights on a "
            "machine with network access, commit the npzs under "
            "skelsplat_tpu/ops/lpips_weights/, or pass weights_path=")
    model = LPIPS.from_npz(weights_path)
    return model(x, y)
