"""Loopback exercise of the SIBR viewer socket protocol
(gaussian_renderer/network_gui.py): init/try_connect on 127.0.0.1, a
crafted JSON camera message, MiniCam decode → Camera pytree, and the
image+verify reply framing."""

import json
import math
import socket
import struct
import time

import numpy as np

from skelsplat_tpu import network_gui
from tests.utils import synthetic_rig, take_cam


def test_network_gui_loopback_roundtrip():
    cams, _, _ = synthetic_rig(n_views=1)
    cam = take_cam(cams, 0)
    view4 = np.asarray(cam.view4, np.float32)
    full4 = np.asarray(cam.full4, np.float32)
    # Viewer wire format: transposed (torch-storage) matrices with the
    # column sign flips receive() undoes — the flips are involutive, so
    # pre-flip here (reference network_gui.py:70-77).
    wvt = view4.T.copy()
    wvt[:, 1] *= -1
    wvt[:, 2] *= -1
    fpt = full4.T.copy()
    fpt[:, 1] *= -1
    message = {
        "resolution_x": int(cam.width), "resolution_y": int(cam.height),
        "train": True,
        "fov_x": 2 * math.atan(float(cam.tan_fovx)),
        "fov_y": 2 * math.atan(float(cam.tan_fovy)),
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": True,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": [float(v) for v in wvt.reshape(-1)],
        "view_projection_matrix": [float(v) for v in fpt.reshape(-1)],
    }

    network_gui.init("127.0.0.1", 0)  # ephemeral port
    port = network_gui.listener.getsockname()[1]
    client = socket.create_connection(("127.0.0.1", port), timeout=10)
    try:
        for _ in range(200):  # accept is non-blocking (settimeout(0))
            network_gui.try_connect()
            if network_gui.conn is not None:
                break
            time.sleep(0.01)
        assert network_gui.conn is not None

        payload = json.dumps(message).encode("utf-8")
        client.sendall(struct.pack("<I", len(payload)) + payload)
        (mini, do_training, shs_python, rot_scale_python, keep_alive,
         scaling) = network_gui.receive()
        assert do_training and keep_alive and rot_scale_python
        assert not shs_python and scaling == 1.0
        assert mini.image_width == int(cam.width)
        assert mini.image_height == int(cam.height)

        decoded = mini.to_camera()
        np.testing.assert_allclose(decoded.view4, view4, atol=3e-5)
        np.testing.assert_allclose(decoded.full4, full4, atol=3e-5)
        np.testing.assert_allclose(decoded.proj4, np.asarray(cam.proj4),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(decoded.cam_center,
                                   np.asarray(cam.cam_center),
                                   rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(float(decoded.focal_x),
                                   float(cam.focal_x), rtol=1e-5)
        np.testing.assert_allclose(float(decoded.focal_y),
                                   float(cam.focal_y), rtol=1e-5)

        # Reply leg: image bytes then length-prefixed verify string.
        image_bytes = bytes(range(12))
        network_gui.send(image_bytes, "verify-me")
        expected = len(image_bytes) + 4 + len("verify-me")
        got = b""
        while len(got) < expected:
            chunk = client.recv(1024)
            assert chunk, "server closed socket early"
            got += chunk
        assert got[:12] == image_bytes
        (n,) = struct.unpack("<I", got[12:16])
        assert got[16:16 + n] == b"verify-me"

        # Zero-resolution message decodes to the all-None tuple.
        payload = json.dumps({"resolution_x": 0, "resolution_y": 0,
                              "train": False}).encode("utf-8")
        client.sendall(struct.pack("<I", len(payload)) + payload)
        assert network_gui.receive() == (None,) * 6
    finally:
        client.close()
        if network_gui.conn is not None:
            network_gui.conn.close()
            network_gui.conn = None
        network_gui.listener.close()
