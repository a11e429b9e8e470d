"""LPIPS architecture parity vs a torch oracle.

Pretrained weights can't be downloaded in this environment, so the JAX
implementation is verified structurally: the same (random but correctly
shaped) weights through our port and through a literal torch transcription
of lpipsPyTorch's forward (networks.py:53-62, lpips.py:31-37, built from
torch.nn.functional — no torchvision needed) must agree to float tolerance
for all three backbones. With exported real weights the same code paths
produce the reference's perceptual distances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.ops import lpips as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_lpips(weights, net_type, x, y):
    cfg = L.BACKBONES[net_type]
    cw = [torch.from_numpy(np.asarray(w)) for w in weights["conv_w"]]
    cb = [torch.from_numpy(np.asarray(b)) for b in weights["conv_b"]]
    lw = [torch.from_numpy(np.asarray(w)) for w in weights["lin_w"]]
    mean = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    std = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]

    def feats(img):
        h = (img - mean) / std
        out, ci = [], 0
        for mod_i, item in enumerate(cfg["layers"], start=1):
            if item[0] == "conv":
                _, o, k, s, p = item
                h = F.conv2d(h, cw[ci], cb[ci], stride=s, padding=p)
                ci += 1
            elif item[0] == "relu":
                h = F.relu(h)
            elif item[0] == "maxpool":
                _, k, s = item
                h = F.max_pool2d(h, k, s)
            else:
                sq = F.relu(F.conv2d(h, cw[ci], cb[ci]))
                e1 = F.relu(F.conv2d(sq, cw[ci + 1], cb[ci + 1]))
                e3 = F.relu(F.conv2d(sq, cw[ci + 2], cb[ci + 2], padding=1))
                h = torch.cat([e1, e3], dim=1)
                ci += 3
            if mod_i in cfg["targets"]:
                out.append(h / (h.pow(2).sum(1, keepdim=True).sqrt() + 1e-10))
            if len(out) == len(cfg["targets"]):
                break
        return out

    fx, fy = feats(torch.from_numpy(x)), feats(torch.from_numpy(y))
    total = torch.zeros(x.shape[0])
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        score = (d * lw[i].reshape(1, -1, 1, 1)).sum(1)
        total = total + score.mean(dim=(1, 2))
    return total.numpy()


@pytest.mark.parametrize("net_type", ["vgg", "alex", "squeeze"])
def test_lpips_matches_torch_oracle(net_type):
    rng = np.random.default_rng(1)
    # alex needs >= 64 px for its stride-4 k11 conv chain
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    w = L.random_weights(net_type, seed=3)
    ours = np.asarray(L.LPIPS(w, net_type)(x, y))
    ref = _torch_lpips(w, net_type, x, y)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    assert (ours > 0).all()


def test_lpips_stage_channels():
    """Feature taps must have the reference's n_channels_list widths
    (networks.py:70,82,93)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    for net_type, cfg in L.BACKBONES.items():
        model = L.LPIPS(L.random_weights(net_type), net_type)
        feats = model._features(x)
        assert tuple(f.shape[1] for f in feats) == tuple(cfg["n_channels"]), \
            net_type


def test_lpips_requires_weights():
    with pytest.raises(RuntimeError, match="weights"):
        L.lpips(np.zeros((1, 3, 8, 8), np.float32),
                np.zeros((1, 3, 8, 8), np.float32))


def test_lpips_npz_roundtrip(tmp_path):
    w = L.random_weights("alex")
    path = str(tmp_path / "alex.npz")
    out = {"net_type": np.asarray("alex")}
    for i, (cw, cb) in enumerate(zip(w["conv_w"], w["conv_b"])):
        out[f"conv{i}_w"], out[f"conv{i}_b"] = cw, cb
    for i, lw in enumerate(w["lin_w"]):
        out[f"lin{i}_w"] = lw
    np.savez(path, **out)
    model = L.LPIPS.from_npz(path)
    assert model.net_type == "alex"
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    d = np.asarray(model(x, x))
    np.testing.assert_allclose(d, 0.0, atol=1e-7)


def test_fetch_script_state_dict_conversion(tmp_path):
    """tools/fetch_lpips_weights.convert_state_dicts: fabricate state dicts
    in the torchvision/richzhang layouts (no torch needed), convert, load
    with LPIPS.from_npz and run a forward — validates the whole offline
    conversion path short of the actual download."""
    import numpy as np

    from skelsplat_tpu.tools.fetch_lpips_weights import convert_state_dicts

    rng = np.random.default_rng(7)
    for net_type, conv_keys in [
        ("alex", [f"features.{i}" for i in (0, 3, 6, 8, 10)]),
        ("vgg", [f"features.{i}"
                 for i in (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)]),
    ]:
        shapes = L._conv_shapes(net_type)
        assert len(shapes) == len(conv_keys)
        backbone = {}
        for key, shape in zip(conv_keys, shapes):
            backbone[f"{key}.weight"] = rng.normal(
                0, 0.05, shape).astype(np.float32)
            backbone[f"{key}.bias"] = rng.normal(
                0, 0.05, shape[0]).astype(np.float32)
        backbone["classifier.0.weight"] = rng.normal(0, 1, (10, 10))
        lin = {f"lin{i}.model.1.weight":
               rng.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32)
               for i, c in enumerate(L.BACKBONES[net_type]["n_channels"])}

        arrays = convert_state_dicts(backbone, lin, net_type)
        path = str(tmp_path / f"{net_type}.npz")
        np.savez(path, **arrays)
        model = L.LPIPS.from_npz(path)
        assert model.net_type == net_type
        x = jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)), jnp.float32)
        y = jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)), jnp.float32)
        d = model(x, y)
        assert d.shape == (1,) and np.isfinite(float(d[0]))
        assert float(model(x, x)[0]) == pytest.approx(0.0, abs=1e-6)

    # shape errors must be caught, not silently written
    bad = dict(backbone)
    bad["features.0.weight"] = rng.normal(0, 1, (7, 3, 3, 3)).astype(
        np.float32)
    with pytest.raises(ValueError, match="shape"):
        convert_state_dicts(bad, lin, "vgg")


def test_default_weights_path_lookup(tmp_path, monkeypatch):
    import os

    import skelsplat_tpu.ops.lpips as lpips_mod

    assert lpips_mod.default_weights_path("vgg") is None or \
        os.path.exists(lpips_mod.default_weights_path("vgg"))
    # lpips() without weights raises with the fetch-script hint
    if lpips_mod.default_weights_path("vgg") is None:
        with pytest.raises(RuntimeError, match="fetch_lpips_weights"):
            lpips_mod.lpips(jnp.zeros((1, 3, 16, 16)),
                            jnp.zeros((1, 3, 16, 16)))
