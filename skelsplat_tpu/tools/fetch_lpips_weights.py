"""Fetch + convert the LPIPS pretrained weights (run on a NETWORKED machine).

This environment has zero egress, so the repo cannot ship the pretrained
tensors themselves; this script is the checksum-pinned recipe that turns
the exact checkpoints the reference uses (lpipsPyTorch/modules/
networks.py:66-97 torchvision backbones + utils.py:11-31 richzhang v0.1
LinLayers) into the npz schema ``ops/lpips.LPIPS.from_npz`` loads:

    python -m skelsplat_tpu.tools.fetch_lpips_weights \
        --out skelsplat_tpu/ops/lpips_weights [--nets vgg alex squeeze]

then commit the produced ``{net}.npz`` files. The conversion maps the raw
state dicts directly (no torchvision import needed — only torch.load):
state dicts preserve registration order, so the 4-D ``features.*.weight``
tensors appear exactly in the traversal order of ops/lpips.BACKBONES
(fire modules contribute squeeze, expand1x1, expand3x3). Every tensor is
shape-checked against the architecture spec before writing.

Downloads are verified: torchvision checkpoint filenames embed the first
8 hex chars of their SHA256 (torch.hub convention), which is checked; the
richzhang files carry no published digest, so their SHA256 is printed and
stored inside the npz (``lin_sha256``) for provenance.
"""

from __future__ import annotations

import argparse
import hashlib
import io
import os
import urllib.request

import numpy as np

from skelsplat_tpu.ops.lpips import BACKBONES, _conv_shapes

# the torchvision IMAGENET1K_V1 checkpoints used by the reference
# (networks.py:66-97); the 8-hex suffix is the sha256 prefix
BACKBONE_URLS = {
    "vgg": "https://download.pytorch.org/models/vgg16-397923af.pth",
    "alex": "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
    "squeeze":
        "https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth",
}

# the LPIPS v0.1 LinLayer state dicts (lpipsPyTorch/modules/utils.py:13-15)
LIN_URL = ("https://raw.githubusercontent.com/richzhang/"
           "PerceptualSimilarity/master/lpips/weights/v0.1/{net}.pth")


def _sha256(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _download(url: str) -> bytes:
    print(f"fetching {url}")
    with urllib.request.urlopen(url) as r:
        return r.read()


def _load_state_dict(data: bytes):
    import torch
    return torch.load(io.BytesIO(data), map_location="cpu",
                      weights_only=True)


def convert_state_dicts(backbone_sd, lin_sd, net_type: str) -> dict:
    """Raw (torchvision backbone, richzhang lin) state dicts → the npz
    array dict of ops/lpips.LPIPS.from_npz. Works on plain dict-of-arrays
    too (tested without torch)."""
    shapes = _conv_shapes(net_type)
    out = {"net_type": np.asarray(net_type)}

    convs = [(k, v) for k, v in backbone_sd.items()
             if k.startswith("features.") and k.endswith(".weight")
             and getattr(v, "ndim", np.ndim(v)) == 4]
    if len(convs) != len(shapes):
        raise ValueError(
            f"{net_type}: expected {len(shapes)} convs in the backbone "
            f"state dict, found {len(convs)}")
    for i, (wkey, w) in enumerate(convs):
        w = np.asarray(w, np.float32)
        if w.shape != shapes[i]:
            raise ValueError(f"{net_type} conv{i} ({wkey}): shape "
                             f"{w.shape} != spec {shapes[i]}")
        b = np.asarray(backbone_sd[wkey[:-len("weight")] + "bias"],
                       np.float32)
        out[f"conv{i}_w"] = w
        out[f"conv{i}_b"] = b

    n_ch = BACKBONES[net_type]["n_channels"]
    for i, c in enumerate(n_ch):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                    f"lin.{i}.1.weight"):
            if key in lin_sd:
                break
        else:
            raise ValueError(f"{net_type} lin{i}: no LinLayer key found "
                             f"(have {sorted(lin_sd)[:4]}...)")
        w = np.asarray(lin_sd[key], np.float32).reshape(1, -1, 1, 1)
        if w.shape[1] != c:
            raise ValueError(f"{net_type} lin{i}: {w.shape[1]} channels, "
                             f"spec says {c}")
        out[f"lin{i}_w"] = w
    return out


def fetch_one(net_type: str, out_dir: str) -> str:
    url = BACKBONE_URLS[net_type]
    blob = _download(url)
    digest = _sha256(blob)
    pin = url.rsplit("-", 1)[-1].split(".")[0]
    if not digest.startswith(pin):
        raise RuntimeError(f"{url}: sha256 {digest[:8]} != pinned {pin}")
    backbone_sd = _load_state_dict(blob)

    lin_blob = _download(LIN_URL.format(net=net_type))
    lin_sha = _sha256(lin_blob)
    print(f"  lin weights sha256: {lin_sha}")
    lin_sd = _load_state_dict(lin_blob)

    arrays = convert_state_dicts(backbone_sd, lin_sd, net_type)
    arrays["lin_sha256"] = np.asarray(lin_sha)
    path = os.path.join(out_dir, f"{net_type}.npz")
    np.savez(path, **arrays)
    print(f"  wrote {path}")
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="skelsplat_tpu/ops/lpips_weights")
    ap.add_argument("--nets", nargs="+", default=["vgg", "alex", "squeeze"],
                    choices=list(BACKBONE_URLS))
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    for net in args.nets:
        fetch_one(net, args.out)


if __name__ == "__main__":
    main()
