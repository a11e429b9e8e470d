"""Round-trip tests for the packed host<->device transfer helpers.

Regression coverage for the round-2 advisor finding: the original
fetch_trees packed int32/bool leaves by bitcasting to float32 and fetching
an f32 buffer; on the TPU backend f32 denormal bit patterns (every int32
< 2^23) flush to zero and NaN payloads are canonicalized in the transfer
path, so e.g. ``history.stopped_at`` always fetched as 0. The carrier is
now int32, which is bit-exact on every backend. These tests run on CPU by
default and on the real chip with SKELSPLAT_TEST_TPU=1 (conftest.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skelsplat_tpu.utils import fetch_trees, put_trees


def _hostile_tree():
    """Leaves chosen to break an f32-carrier packing: denormal-range ints,
    negative ints, INT32_MAX (an f32 NaN bit pattern), bools, f32 NaN/inf
    and a real f32 denormal."""
    return {
        "ints": np.array([0, 1, 8, -5, 2**31 - 1, -(2**31)], np.int32),
        "bools": np.array([True, False, True, True, False]),
        "floats": np.array(
            [0.0, -0.0, 1.5, np.nan, np.inf, -np.inf, 1e-40, 3.14], np.float32),
        "nested": (np.arange(12, dtype=np.float32).reshape(3, 4),
                   np.array([[7, -7], [123456, 0]], np.int32)),
        "scalar_passthrough": 3,
        "none_passthrough": None,
    }


def _assert_tree_bitexact(got, want):
    def cmp(g, w):
        if w is None or isinstance(w, int):
            assert g == w
            return
        g = np.asarray(g)
        w = np.asarray(w)
        assert g.shape == w.shape and g.dtype == w.dtype
        if w.dtype == np.float32:
            np.testing.assert_array_equal(
                g.view(np.int32), w.view(np.int32))
        else:
            np.testing.assert_array_equal(g, w)
    jax.tree.map(cmp, got, want, is_leaf=lambda x: x is None)


def test_fetch_trees_roundtrip_bitexact():
    host = _hostile_tree()
    dev = jax.tree.map(jnp.asarray,
                       {k: v for k, v in host.items()
                        if k not in ("scalar_passthrough", "none_passthrough")})
    dev["scalar_passthrough"] = 3
    dev["none_passthrough"] = None
    back = fetch_trees(dev)
    _assert_tree_bitexact(back, host)


def test_put_then_fetch_roundtrip_bitexact():
    host = _hostile_tree()
    dev = put_trees(host)
    # on-device leaves must be real jax arrays with the original dtypes
    assert isinstance(dev["ints"], jax.Array)
    assert dev["ints"].dtype == jnp.int32
    assert dev["bools"].dtype == jnp.bool_
    assert dev["floats"].dtype == jnp.float32
    back = fetch_trees(dev)
    _assert_tree_bitexact(back, host)


def test_fetch_trees_multiple_trees_and_uint32():
    a = jnp.asarray(np.array([1, 2, 3], np.uint32))
    b = {"x": jnp.asarray(np.float32([0.25, 7.0])),
         "stopped_at": jnp.asarray(np.int32(42))[None]}
    ra, rb = fetch_trees(a, b)
    np.testing.assert_array_equal(ra, np.array([1, 2, 3], np.uint32))
    assert ra.dtype == np.uint32
    assert int(rb["stopped_at"][0]) == 42
    np.testing.assert_array_equal(rb["x"], np.float32([0.25, 7.0]))


def test_fetch_trees_no_device_leaves_passthrough():
    tree = {"a": np.arange(3), "b": None, "c": 5}
    assert fetch_trees(tree) == tree


@pytest.mark.skipif(not os.environ.get("SKELSPLAT_TEST_TPU"),
                    reason="TPU opt-in round-trip (SKELSPLAT_TEST_TPU=1)")
def test_roundtrip_on_tpu_backend():
    # The failure mode this guards against only manifests on the TPU
    # transfer path; run the same hostile tree through the real chip.
    host = _hostile_tree()
    back = fetch_trees(put_trees(host))
    _assert_tree_bitexact(back, host)
