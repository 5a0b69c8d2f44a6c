"""Storage layer: czip / ctar / dirfs over synthetic archives."""

import io
import os
import tarfile
import zipfile

import pytest

from opendwm_tpu.fs import (
    CombinedTarFileSystem,
    CombinedZipFileSystem,
    DirFileSystem,
)


@pytest.fixture(scope="module")
def archives(tmp_path_factory):
    root = tmp_path_factory.mktemp("archives")
    # zip 1: stored; zip 2: deflated
    z1 = root / "a.zip"
    with zipfile.ZipFile(z1, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("scene/0/img.bin", b"stored-bytes-0123456789")
        zf.writestr("scene/0/meta.txt", b"hello")
    z2 = root / "b.zip"
    with zipfile.ZipFile(z2, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("scene/1/img.bin", b"deflated" * 100)
    t1 = root / "c.tar"
    with tarfile.open(t1, "w") as tf:
        data = b"tar-member-payload"
        ti = tarfile.TarInfo("lidar/0.bin")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    d = root / "plain"
    d.mkdir()
    (d / "x.txt").write_bytes(b"dirfs")
    return root


class TestCZip:
    def test_read_stored_and_deflated(self, archives):
        fs = CombinedZipFileSystem(
            paths=[str(archives / "a.zip"), str(archives / "b.zip")]
        )
        with fs.open("scene/0/img.bin") as f:
            assert f.read() == b"stored-bytes-0123456789"
        with fs.open("scene/1/img.bin") as f:
            assert f.read() == b"deflated" * 100

    def test_partial_read_and_seek(self, archives):
        fs = CombinedZipFileSystem(paths=[str(archives / "a.zip")])
        with fs.open("scene/0/img.bin") as f:
            assert f.read(6) == b"stored"
            f.seek(7)
            assert f.read(5) == b"bytes"

    def test_ls_and_info(self, archives):
        fs = CombinedZipFileSystem(
            paths=[str(archives / "a.zip"), str(archives / "b.zip")]
        )
        names = fs.ls("scene", detail=False)
        assert names == ["scene/0", "scene/1"]
        assert fs.info("scene/0/meta.txt")["size"] == 5
        with pytest.raises(FileNotFoundError):
            fs.open("missing")

    def test_info_json_cache_roundtrip(self, archives, tmp_path):
        import json

        fs = CombinedZipFileSystem(paths=[str(archives / "a.zip")])
        info = fs.make_info()[str(archives / "a.zip")]
        info_path = str(archives / "a.zip") + ".info.json"
        with open(info_path, "w") as f:
            json.dump(info, f)
        fs2 = CombinedZipFileSystem(
            paths=[str(archives / "a.zip")], enable_cached_info=True
        )
        with fs2.open("scene/0/meta.txt") as f:
            assert f.read() == b"hello"
        os.remove(info_path)


class TestCTar:
    def test_read_member(self, archives):
        fs = CombinedTarFileSystem(paths=[str(archives / "c.tar")])
        with fs.open("lidar/0.bin") as f:
            assert f.read() == b"tar-member-payload"
        assert fs.info("lidar/0.bin")["size"] == 18


class TestDirFs:
    def test_prefix(self, archives):
        fs = DirFileSystem(str(archives / "plain"))
        with fs.open("x.txt") as f:
            assert f.read() == b"dirfs"
        assert fs.exists("x.txt") and not fs.exists("y.txt")
