"""Round-trip tests for the full COLMAP model dispatchers
(utils/read_write_model.py:427-530): write_model → read_model equality
over a synthetic model in both text and binary wire formats."""

import numpy as np
import pytest

from skelsplat_tpu.data import colmap


def _synthetic_model():
    cameras = {
        1: colmap.Camera(id=1, model="PINHOLE", width=640, height=480,
                         params=np.array([500.0, 501.5, 320.0, 240.0])),
        3: colmap.Camera(id=3, model="PINHOLE", width=320, height=240,
                         params=np.array([250.25, 251.0, 160.0, 120.0])),
    }
    q = np.array([0.9, 0.1, -0.2, 0.4])
    images = {
        2: colmap.Image(id=2, qvec=q / np.linalg.norm(q),
                        tvec=np.array([0.5, -1.25, 3.0]), camera_id=1,
                        name="frame_0001.png",
                        xys=np.array([[10.5, 20.25], [30.0, 40.75]]),
                        point3D_ids=np.array([7, -1])),
        5: colmap.Image(id=5, qvec=np.array([1.0, 0.0, 0.0, 0.0]),
                        tvec=np.array([-2.0, 0.0, 1.5]), camera_id=3,
                        name="frame_0002.png",
                        xys=np.array([[5.0, 6.5]]),
                        point3D_ids=np.array([9])),
    }
    points3D = {
        7: colmap.Point3D(id=7, xyz=np.array([0.1, -0.5, 2.25]),
                          rgb=np.array([255, 0, 128]),
                          error=np.array(0.75),
                          image_ids=np.array([2, 5]),
                          point2D_idxs=np.array([0, 0])),
        9: colmap.Point3D(id=9, xyz=np.array([-1.5, 2.0, 0.5]),
                          rgb=np.array([10, 20, 30]),
                          error=np.array(1.5),
                          image_ids=np.array([5]),
                          point2D_idxs=np.array([0])),
    }
    return cameras, images, points3D


def _assert_models_equal(a, b):
    cams_a, imgs_a, pts_a = a
    cams_b, imgs_b, pts_b = b
    assert set(cams_a) == set(cams_b)
    for cid in cams_a:
        ca, cb = cams_a[cid], cams_b[cid]
        assert (ca.id, ca.model, ca.width, ca.height) == \
               (cb.id, cb.model, cb.width, cb.height)
        np.testing.assert_allclose(ca.params, cb.params)
    assert set(imgs_a) == set(imgs_b)
    for iid in imgs_a:
        ia, ib = imgs_a[iid], imgs_b[iid]
        assert (ia.id, ia.camera_id, ia.name) == (ib.id, ib.camera_id,
                                                  ib.name)
        np.testing.assert_allclose(ia.qvec, ib.qvec)
        np.testing.assert_allclose(ia.tvec, ib.tvec)
        np.testing.assert_allclose(ia.xys, ib.xys)
        np.testing.assert_array_equal(ia.point3D_ids, ib.point3D_ids)
    assert set(pts_a) == set(pts_b)
    for pid in pts_a:
        pa, pb = pts_a[pid], pts_b[pid]
        assert pa.id == pb.id
        np.testing.assert_allclose(pa.xyz, pb.xyz)
        np.testing.assert_array_equal(pa.rgb, pb.rgb)
        np.testing.assert_allclose(np.asarray(pa.error),
                                   np.asarray(pb.error))
        np.testing.assert_array_equal(pa.image_ids, pb.image_ids)
        np.testing.assert_array_equal(pa.point2D_idxs, pb.point2D_idxs)


@pytest.mark.parametrize("ext", [".txt", ".bin"])
def test_write_read_model_roundtrip(tmp_path, ext):
    model = _synthetic_model()
    colmap.write_model(*model, str(tmp_path), ext=ext)
    recovered = colmap.read_model(str(tmp_path), ext=ext)
    _assert_models_equal(model, recovered)


def test_read_model_autodetects_format(tmp_path):
    model = _synthetic_model()
    colmap.write_model(*model, str(tmp_path), ext=".bin")
    _assert_models_equal(model, colmap.read_model(str(tmp_path)))
    with pytest.raises(FileNotFoundError):
        colmap.read_model(str(tmp_path / "nowhere"))


def test_points3D_array_readers_see_written_payload(tmp_path):
    """The colmap_loader-style (xyzs, rgbs, errors) readers parse files
    produced by the new writers identically in both formats."""
    _, _, points3D = _synthetic_model()
    txt, binp = str(tmp_path / "p.txt"), str(tmp_path / "p.bin")
    colmap.write_points3D_text(points3D, txt)
    colmap.write_points3D_binary(points3D, binp)
    xyz_t, rgb_t, err_t = colmap.read_points3D_text(txt)
    xyz_b, rgb_b, err_b = colmap.read_points3D_binary(binp)
    ot, ob = np.argsort(xyz_t[:, 0]), np.argsort(xyz_b[:, 0])
    np.testing.assert_allclose(xyz_t[ot], xyz_b[ob])
    np.testing.assert_allclose(rgb_t[ot], rgb_b[ob])
    np.testing.assert_allclose(err_t[ot], err_b[ob])
    expected = np.sort(np.stack([p.xyz for p in points3D.values()]), axis=0)
    np.testing.assert_allclose(np.sort(xyz_t, axis=0), expected)
