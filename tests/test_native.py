import numpy as np
import pytest

from skelsplat_tpu.data import ply
from skelsplat_tpu import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library not available (no compiler?)")
    return True


def test_native_read_matches_python(built, tmp_path, rng):
    xyz = rng.normal(0, 100, (17, 3)).astype(np.float32)
    p1 = str(tmp_path / "g.ply")
    ply.write_gaussian_ply(p1, xyz, np.full((17, 3), 3.0, np.float32),
                           np.tile([1, 0, 0, 0], (17, 1)).astype(np.float32),
                           np.full((17, 1), 40.0, np.float32))
    np.testing.assert_allclose(native.read_xyz(p1), ply.read_xyz(p1))

    # double-precision triangulation cloud
    p2 = str(tmp_path / "d.ply")
    ply.write_xyz_double_ply(p2, xyz.astype(np.float64))
    np.testing.assert_allclose(native.read_xyz(p2), xyz, atol=1e-5)

    # point cloud with uchar colors
    p3 = str(tmp_path / "c.ply")
    ply.write_point_ply(p3, xyz, np.ones_like(xyz) * 255)
    np.testing.assert_allclose(native.read_xyz(p3), xyz)


def test_native_batch_read(built, tmp_path, rng):
    paths = []
    ref = []
    for i in range(23):
        xyz = rng.normal(0, 100, (17, 3)).astype(np.float32)
        p = str(tmp_path / f"s{i}.ply")
        ply.write_gaussian_ply(p, xyz, np.zeros((17, 3), np.float32),
                               np.tile([1, 0, 0, 0], (17, 1)).astype(np.float32),
                               np.zeros((17, 1), np.float32))
        paths.append(p)
        ref.append(xyz)
    out, counts = native.read_xyz_batch(paths, max_pts=32)
    assert np.all(counts == 17)
    for i in range(23):
        np.testing.assert_allclose(out[i, :17], ref[i])


def test_native_knn_matches_jax(built, rng):
    from skelsplat_tpu.ops.knn import dist2_mean3nn
    pts = rng.normal(0, 1, (1531, 3)).astype(np.float32)
    a = native.knn_mean3_sq(pts)
    b = np.asarray(dist2_mean3nn(pts))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
