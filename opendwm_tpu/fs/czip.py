"""Combined multi-ZIP filesystem (fsspec).

Serves files from a set of ZIP archives as one namespace (reference
src/dwm/fs/czip.py:13-160): central directories are read once (optionally
from a precomputed ``.info.json`` offset cache so huge archives need no
directory scan), file handles are cached **per pid** so forked dataloader
workers never share seek positions, stored (uncompressed) members are served
as zero-copy range views and deflated members are inflated in memory.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zipfile
import zlib
from typing import Optional

import fsspec

from opendwm_tpu.config import register


class RangeReaderIO(io.RawIOBase):
    """Read-only view of a byte range of an underlying file object
    (reference PartialReadableRawIO, src/dwm/common.py:9-64)."""

    def __init__(self, fileobj, start: int, end: int):
        super().__init__()
        self._f = fileobj
        self._start = start
        self._end = end
        self._pos = 0

    def readable(self):
        return True

    def seekable(self):
        return True

    def seek(self, offset, whence=io.SEEK_SET):
        if whence == io.SEEK_SET:
            self._pos = offset
        elif whence == io.SEEK_CUR:
            self._pos += offset
        else:
            self._pos = (self._end - self._start) + offset
        return self._pos

    def tell(self):
        return self._pos

    def read(self, size=-1):
        remaining = (self._end - self._start) - self._pos
        if size < 0 or size > remaining:
            size = max(remaining, 0)
        if size == 0:
            return b""
        self._f.seek(self._start + self._pos)
        data = self._f.read(size)
        self._pos += len(data)
        return data

    def readinto(self, b):  # BufferedReader's primitive
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)


@register(
    "CombinedZipFileSystem", aliases=("dwm.fs.czip.CombinedZipFileSystem",)
)
class CombinedZipFileSystem(fsspec.AbstractFileSystem):
    protocol = "czip"

    def __init__(
        self,
        fs: Optional[fsspec.AbstractFileSystem] = None,
        paths: Optional[list[str]] = None,
        enable_cached_info: bool = False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.fs = fs or fsspec.filesystem("file")
        self.paths = paths or []
        self._index: dict[str, tuple[str, dict]] = {}
        self._fp_cache: dict[tuple[int, str], object] = {}
        for archive in self.paths:
            info = None
            if enable_cached_info:
                info_path = archive + ".info.json"
                if self.fs.exists(info_path):
                    with self.fs.open(info_path, "r") as f:
                        info = json.load(f)
            if info is not None:
                for name, meta in info.items():
                    self._index[name] = (archive, meta)
            else:
                self._scan_archive(archive)

    def _scan_archive(self, archive: str):
        """Index one archive's central directory — through the native
        scanner (opendwm_tpu.native) when built, else zipfile."""
        try:
            from opendwm_tpu import native

            if native.available():
                data = self.fs.cat_file(archive)
                for e in native.zip_scan_central_directory(data):
                    name = e.pop("name")
                    self._index[name] = (archive, e)
                return
        except Exception:
            pass  # fall back to the pure-Python scan
        with self.fs.open(archive, "rb") as f:
            zf = zipfile.ZipFile(f)
            for zi in zf.infolist():
                if zi.is_dir():
                    continue
                self._index[zi.filename] = (
                    archive,
                    {
                        "header_offset": zi.header_offset,
                        "compress_type": zi.compress_type,
                        "compress_size": zi.compress_size,
                        "file_size": zi.file_size,
                    },
                )

    def _archive_fp(self, archive: str):
        key = (os.getpid(), archive)  # fork safety: one handle per pid
        if key not in self._fp_cache:
            self._fp_cache[key] = self.fs.open(archive, "rb")
        return self._fp_cache[key]

    def _ls_from_index(self, path, detail):
        path = path.strip("/")
        entries = set()
        for name in self._index:
            if not path or name.startswith(path + "/"):
                rest = name[len(path) + 1 if path else 0:]
                first = rest.split("/")[0]
                entries.add(
                    (path + "/" + first if path else first,
                     "/" in rest)
                )
        out = []
        for name, is_dir in sorted(entries):
            if detail:
                out.append({
                    "name": name,
                    "type": "directory" if is_dir else "file",
                    "size": None if is_dir else
                    self._index[name][1]["file_size"],
                })
            else:
                out.append(name)
        return out

    def ls(self, path, detail=True, **kwargs):
        return self._ls_from_index(path, detail)

    def exists(self, path, **kwargs):
        return path in self._index or bool(
            self._ls_from_index(path, False)
        )

    def info(self, path, **kwargs):
        if path in self._index:
            return {
                "name": path, "type": "file",
                "size": self._index[path][1]["file_size"],
            }
        if self._ls_from_index(path, False):
            return {"name": path, "type": "directory", "size": None}
        raise FileNotFoundError(path)

    def _data_offset(self, fp, meta) -> int:
        # Local file header: 30 bytes fixed + name len + extra len.
        fp.seek(meta["header_offset"])
        header = fp.read(30)
        if header[:4] != b"PK\x03\x04":
            raise ValueError("bad local file header")
        name_len, extra_len = struct.unpack("<HH", header[26:30])
        return meta["header_offset"] + 30 + name_len + extra_len

    def _open(self, path, mode="rb", **kwargs):
        if "r" not in mode:
            raise NotImplementedError("read-only filesystem")
        if path not in self._index:
            raise FileNotFoundError(path)
        archive, meta = self._index[path]
        fp = self._archive_fp(archive)
        data_start = self._data_offset(fp, meta)
        if meta["compress_type"] == zipfile.ZIP_STORED:
            return io.BufferedReader(
                RangeReaderIO(fp, data_start, data_start + meta["file_size"])
            )
        if meta["compress_type"] == zipfile.ZIP_DEFLATED:
            fp.seek(data_start)
            raw = fp.read(meta["compress_size"])
            return io.BytesIO(zlib.decompress(raw, -15))
        raise NotImplementedError(
            f"compression {meta['compress_type']} unsupported"
        )

    def make_info(self) -> dict:
        """Offset cache payload for ``.info.json`` files (reference
        tools/fs_make_info_json.py)."""
        out: dict[str, dict] = {}
        for name, (archive, meta) in self._index.items():
            out.setdefault(archive, {})[name] = meta
        return out
