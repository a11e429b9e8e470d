"""Misc runtime utilities (ports of utils/general_utils.py:121-142 safe_state
and utils/system_utils.py)."""

from __future__ import annotations

import os
import random
import sys
from datetime import datetime

import numpy as np


def safe_state(silent: bool):
    """Timestamp every stdout line and seed all host RNGs to 0
    (general_utils.py:121-142). The reference also pins cuda:0; device
    selection on TPU is the runtime's job."""

    old_f = sys.stdout

    class F:
        def __init__(self, silent):
            self.silent = silent

        def write(self, x):
            if not self.silent:
                if x.endswith("\n"):
                    old_f.write(x.replace(
                        "\n", " [{}]\n".format(
                            datetime.now().strftime("%d/%m %H:%M:%S"))))
                else:
                    old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = F(silent)
    random.seed(0)
    np.random.seed(0)
    try:
        import torch

        # the reference also seeds torch (general_utils.py:141); the torch
        # CPU generator feeds the bitwise dropout draws (ops/heatmaps.py)
        torch.manual_seed(0)
    except ImportError:
        pass


def pil_to_array(pil_image, resolution=None):
    """CHW float image in [0,1] from a PIL image (general_utils.py:30-36,
    PILtoTorch — the resize is commented out in the reference too)."""
    arr = np.array(pil_image) / 255.0
    if arr.ndim == 3:
        return np.transpose(arr, (2, 0, 1))
    return arr[None, ...]


def mkdir_p(folder_path):
    os.makedirs(folder_path, exist_ok=True)


def searchForMaxIteration(folder):
    """system_utils.py:26-28."""
    saved_iters = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved_iters)


def fetch_trees(*trees):
    """Fetch every device array in ``trees`` to numpy in ONE device
    round-trip.

    Through a remote-device tunnel each host fetch costs a full RPC
    (~25-35 ms) and ``jax.device_get`` does not batch, so pulling a
    params pytree + telemetry history leaf-by-leaf costs hundreds of
    milliseconds per scene. This packs all float32/int32/bool leaves into
    one flat buffer on-device, fetches it once, and unpacks host-side.

    The carrier dtype is int32, NOT float32: on the TPU backend, float32
    buffers holding bit patterns that happen to be denormals get flushed
    to zero and NaN payloads are canonicalized somewhere in the
    copy/transfer path, so int32 values < 2^23 (all of them, in practice)
    would silently fetch as 0. Integer ops and D2H transfers preserve
    bits, and f32 values bitcast to int32 round-trip exactly.

    Non-array leaves (python ints, numpy arrays, None) pass through
    untouched. Returns the same structures.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(trees)
    idx = [i for i, l in enumerate(leaves)
           if isinstance(l, jax.Array) and l.size > 0]
    if not idx:
        return trees if len(trees) != 1 else trees[0]

    def pack(x):
        x = jnp.ravel(x)
        if x.dtype == jnp.float32:
            return jax.lax.bitcast_convert_type(x, jnp.int32)
        if x.dtype == jnp.bool_:
            return x.astype(jnp.int32)
        if x.dtype == jnp.int32:
            return x
        if x.dtype == jnp.uint32:
            return jax.lax.bitcast_convert_type(x, jnp.int32)
        raise TypeError(f"fetch_trees: unsupported dtype {x.dtype}")

    # the pack runs as ONE jitted program (cached per leaf spec): eagerly
    # it is 2 ops per leaf + a concat, i.e. hundreds of tiny dispatches
    # per fetch — ~10 ms of exposed RPC overhead per call through remote
    # tunnels even when fully pipelined
    spec = tuple((leaves[i].shape, str(leaves[i].dtype)) for i in idx)
    packer = _FETCH_CACHE.get(spec)
    if packer is None:
        packer = jax.jit(
            lambda xs: jnp.concatenate([pack(x) for x in xs]))
        _FETCH_CACHE[spec] = packer
    flat = np.asarray(packer([leaves[i] for i in idx]))

    out = list(leaves)
    off = 0
    for i in idx:
        l = leaves[i]
        chunk = flat[off:off + l.size]
        off += l.size
        if l.dtype == jnp.float32:
            chunk = chunk.view(np.float32)
        elif l.dtype == jnp.bool_:
            chunk = chunk.astype(bool)
        elif l.dtype == jnp.uint32:
            chunk = chunk.view(np.uint32)
        out[i] = chunk.reshape(l.shape)
    res = jax.tree.unflatten(treedef, out)
    return res if len(trees) != 1 else res[0]


_PUT_CACHE: dict = {}
_FETCH_CACHE: dict = {}


def put_trees(*trees):
    """Transfer every host (numpy) array in ``trees`` to the device in ONE
    H2D transfer — the inverse of ``fetch_trees``. float32/int32/bool
    leaves are packed into one flat int32 buffer (f32 bitcast host-side;
    integer transfers are bit-exact on every backend, f32 denormal bit
    patterns are not on TPU); a cached jitted unpacker (one dispatch)
    slices and bitcasts them back on-device. Device arrays and non-array
    leaves pass through untouched."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(trees)
    np_types = (np.float32, np.int32, np.bool_)
    idx = [i for i, l in enumerate(leaves)
           if isinstance(l, np.ndarray) and l.size > 0
           and l.dtype in np_types]
    if not idx:
        res = jax.tree.unflatten(treedef, leaves)
        return res if len(trees) != 1 else res[0]

    specs = tuple((leaves[i].shape, str(leaves[i].dtype)) for i in idx)
    bufs = []
    for i in idx:
        l = np.ravel(leaves[i])
        if l.dtype == np.bool_:
            l = l.astype(np.int32)
        if l.dtype == np.float32:
            l = l.view(np.int32)
        bufs.append(l)
    flat = np.concatenate(bufs)

    unpack = _PUT_CACHE.get(specs)
    if unpack is None:
        import math

        @jax.jit
        def unpack(flat):
            out, off = [], 0
            for shape, dt in specs:
                size = math.prod(shape) if shape else 1
                chunk = flat[off:off + size]
                off += size
                if dt == "bool":
                    chunk = chunk.astype(bool)
                elif dt == "float32":
                    chunk = jax.lax.bitcast_convert_type(chunk, jnp.float32)
                out.append(chunk.reshape(shape))
            return out
        _PUT_CACHE[specs] = unpack

    dev = unpack(jnp.asarray(flat))
    out = list(leaves)
    for j, i in enumerate(idx):
        out[i] = dev[j]
    res = jax.tree.unflatten(treedef, out)
    return res if len(trees) != 1 else res[0]
