"""Native data-plane library vs pure-Python fallbacks."""

import io
import zipfile
import zlib

import numpy as np
import pytest

import opendwm_tpu.native as native


def make_zip():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a/b.bin", b"x" * 1000)
        zf.writestr("c.txt", b"hello world")
    return buf.getvalue()


class TestNative:
    def test_zip_scan_matches_zipfile(self):
        data = make_zip()
        entries = {e["name"]: e for e in
                   native.zip_scan_central_directory(data)}
        zf = zipfile.ZipFile(io.BytesIO(data))
        for zi in zf.infolist():
            e = entries[zi.filename]
            assert e["header_offset"] == zi.header_offset
            assert e["compress_type"] == zi.compress_type
            assert e["file_size"] == zi.file_size

    def test_inflate(self):
        payload = b"payload" * 50
        comp = zlib.compress(payload)[2:-4]  # raw deflate
        assert native.inflate_raw(comp, 4096) == payload

    def test_lidar_decode_and_filter(self):
        rng = np.random.default_rng(0)
        pts = (rng.standard_normal((100, 5)) * 10).astype(np.float32)
        out, mask = native.decode_lidar_bin(pts.tobytes(), 5, 128)
        assert mask.sum() == 100
        np.testing.assert_allclose(out[:100], pts[:, :3])
        out_f, mask_f = native.decode_lidar_bin(
            pts.tobytes(), 5, 128, pc_range=(-5, -5, -5, 5, 5, 5)
        )
        inside = np.all(np.abs(pts[:, :3]) <= 5, -1).sum()
        assert mask_f.sum() == inside

    @pytest.mark.skipif(not native.available(), reason="no toolchain")
    def test_voxelize_native_matches_jax_op(self):
        import jax.numpy as jnp

        from opendwm_tpu.ops.voxelize import Voxelizer

        rng = np.random.default_rng(1)
        pts = rng.uniform(-6, 6, (200, 3)).astype(np.float32)
        v = Voxelizer(x_min=-4, x_max=4, y_min=-4, y_max=4, step=0.5,
                      z_min=-1, z_max=1, z_step=0.25)
        grid_native = native.voxelize_points_host(
            pts, None, v.x_min, v.y_min, v.z_min, v.step, v.z_step,
            *v.grid_shape,
        )
        grid_jax = np.asarray(
            v(jnp.asarray(pts)[None, None], jnp.ones((1, 1, 200), bool))
        )[0, 0]
        np.testing.assert_array_equal(grid_native, grid_jax)
