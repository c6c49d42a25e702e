"""SIBR viewer protocol: byte-level golden transcript (VERDICT r1 #9).

The reference's viewer hook (`/root/reference/gaussian_renderer/
network_gui.py:42-86`) speaks: [4-byte LE length][UTF-8 JSON] requests;
replies are raw H*W*3 uint8 RGB followed by [4-byte LE length][ASCII
verify string]. A stock SIBR remote client encodes exactly this, so the
test drives our `NetworkGUI` over a real socket with a canonical
request byte-string and asserts the reply FRAMING byte-for-byte, plus
that the parsed camera reproduces the reference's sign-flip fixup
(`network_gui.py:73-77`) bit-exactly.
"""

import json
import socket
import struct
import threading
import time

import numpy as np
import pytest

from wast3d_tpu.viewer.network_gui import GuiCamera, NetworkGUI

# A canonical SIBR-style request (every key the reference `receive()`
# reads, `network_gui.py:63-71`). Matrices are row-major flattened.
VIEW = np.array(
    [[0.936, 0.0, 0.352, 0.0],
     [0.062, 0.984, -0.166, 0.0],
     [-0.347, 0.178, 0.921, 0.0],
     [0.1, -0.2, 4.0, 1.0]], np.float32)
VIEWPROJ = np.array(
    [[1.77, 0.0, 0.35, 0.35],
     [0.11, 1.86, -0.16, -0.16],
     [-0.65, 0.33, 0.92, 0.92],
     [0.18, -0.37, 3.99, 4.0]], np.float32)

REQUEST = {
    "resolution_x": 8,
    "resolution_y": 6,
    "train": True,
    "fov_y": 0.8,
    "fov_x": 0.9,
    "z_near": 0.01,
    "z_far": 100.0,
    "shs_python": False,
    "rot_scale_python": False,
    "keep_alive": True,
    "scaling_modifier": 1.0,
    "view_matrix": VIEW.reshape(-1).tolist(),
    "view_projection_matrix": VIEWPROJ.reshape(-1).tolist(),
}


def _frame(msg: dict) -> bytes:
    body = json.dumps(msg).encode("utf-8")
    return len(body).to_bytes(4, "little") + body


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def test_gui_camera_sign_flip_matches_reference():
    """GuiCamera must apply the exact fixup the reference does:
    view[:,1] *= -1, view[:,2] *= -1, viewproj[:,1] *= -1."""
    cam = GuiCamera(REQUEST)
    want_view = VIEW.copy()
    want_view[:, 1] = -want_view[:, 1]
    want_view[:, 2] = -want_view[:, 2]
    want_proj = VIEWPROJ.copy()
    want_proj[:, 1] = -want_proj[:, 1]
    np.testing.assert_array_equal(cam.view_transform, want_view)
    np.testing.assert_array_equal(cam.full_proj_transform, want_proj)
    np.testing.assert_allclose(
        cam.camera_center, np.linalg.inv(want_view)[3, :3], rtol=1e-5)
    assert cam.width == 8 and cam.height == 6
    assert cam.do_training and cam.keep_alive
    assert cam.scaling_modifier == 1.0


def test_wire_transcript_byte_exact():
    gui = NetworkGUI(host="127.0.0.1", port=0 or _free_port(),
                     verify="/models/golden")
    try:
        client = socket.create_connection(("127.0.0.1", gui.port), timeout=5)
        client.settimeout(5)
        client.sendall(_frame(REQUEST))

        # Server exposes the request; the train loop answers with a frame.
        req = _wait_pending(gui)
        assert req is not None and (req.width, req.height) == (8, 6)
        img = np.linspace(0, 1, 8 * 6 * 3, dtype=np.float32).reshape(6, 8, 3)
        gui.submit_frame(img)

        # --- golden reply framing ---
        rgb = _recv_exact(client, 6 * 8 * 3)
        expect_rgb = (np.clip(img, 0, 1) * 255).astype(np.uint8).tobytes()
        assert rgb == expect_rgb  # raw bytes, row-major HWC
        vlen = struct.unpack("<I", _recv_exact(client, 4))[0]
        assert vlen == len("/models/golden")
        assert _recv_exact(client, vlen) == b"/models/golden"

        # --- keep-alive: resolution 0 -> verify-only reply ---
        keep = dict(REQUEST, resolution_x=0, resolution_y=0)
        client.sendall(_frame(keep))
        vlen2 = struct.unpack("<I", _recv_exact(client, 4))[0]
        assert _recv_exact(client, vlen2) == b"/models/golden"
        client.close()
    finally:
        gui.stop()


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _wait_pending(gui, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        req = gui.pending()
        if req is not None:
            return req
        time.sleep(0.01)
    return None
