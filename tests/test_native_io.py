"""Native C++ IO fast path: build, parity with the numpy readers."""

import os

import numpy as np
import pytest

from wast3d_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestNative:
    @requires_native
    def test_ply_roundtrip_matches_numpy(self, tmp_path):
        from tests.test_scene_ply_knn import _random_scene
        from wast3d_tpu.scene import ply as ply_mod

        s = _random_scene(123)
        path = str(tmp_path / "x.ply")
        ply_mod.save_ply(s, path)

        data, rows, cols = native.read_ply_f32(path)
        assert rows == 123 and cols == 62  # 3+3+3+45+1+3+4

        # Full loader (which routes through native) == forced numpy loader.
        arrs_fast = ply_mod.load_ply_arrays(path)
        os.environ["WAST3D_NO_NATIVE"] = "1"
        try:
            # reset the module cache to honor the env var
            native._tried = False
            native._lib = None
            arrs_np = ply_mod.load_ply_arrays(path)
        finally:
            del os.environ["WAST3D_NO_NATIVE"]
            native._tried = False
            native._lib = None
        for k in arrs_fast:
            np.testing.assert_array_equal(arrs_fast[k], arrs_np[k], err_msg=k)

    @requires_native
    def test_colmap_points_parity(self, tmp_path):
        from wast3d_tpu.scene import colmap as cm

        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(77, 3))
        rgb = rng.integers(0, 255, (77, 3))
        path = str(tmp_path / "points3D.bin")
        cm.write_points3d_binary(xyz, rgb, path)

        fast = native.read_colmap_points3d(path)
        assert fast is not None
        np.testing.assert_allclose(fast[0], xyz, atol=0)
        np.testing.assert_array_equal(fast[1], rgb.astype(np.uint8))

    @requires_native
    def test_ply_writer(self, tmp_path):
        data = np.arange(24, dtype=np.float32).reshape(6, 4)
        header = (
            "ply\nformat binary_little_endian 1.0\nelement vertex 6\n"
            + "".join(f"property float p{i}\n" for i in range(4))
            + "end_header\n"
        )
        path = str(tmp_path / "w.ply")
        assert native.write_ply_f32(path, header, data)
        rd, rows, cols = native.read_ply_f32(path)
        np.testing.assert_array_equal(rd, data)

    @requires_native
    def test_rejects_non_float_ply(self, tmp_path):
        from wast3d_tpu.scene.datasets import store_ply_points

        rng = np.random.default_rng(1)
        path = str(tmp_path / "pts.ply")
        store_ply_points(path, rng.normal(size=(10, 3)), rng.uniform(0, 255, (10, 3)))
        # uchar colors -> fast path politely declines
        assert native.read_ply_f32(path) is None

    @requires_native
    def test_header_comment_containing_end_header(self, tmp_path):
        """A comment line mentioning 'end_header' must not truncate the
        header scan (advisor finding r1: rfind substring match)."""
        data = np.arange(12, dtype=np.float32).reshape(4, 3)
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               "comment see end_header docs\n"
               "element vertex 4\n"
               "property float x\nproperty float y\nproperty float z\n"
               "end_header\n")
        path = str(tmp_path / "c.ply")
        with open(path, "wb") as f:
            f.write(hdr.encode())
            f.write(data.tobytes())
        out, rows, cols = native.read_ply_f32(path)
        assert rows == 4 and cols == 3
        np.testing.assert_allclose(np.asarray(out).reshape(4, 3), data)
