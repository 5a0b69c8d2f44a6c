"""Combined multi-TAR filesystem (uncompressed tars, fsspec).

Reference src/dwm/fs/ctar.py:9-121 — member data is served as range views
into the archives (uncompressed TAR members are contiguous), with optional
``.info.json`` offset caches and per-pid handle caching for fork safety.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Optional

import fsspec

from opendwm_tpu.config import register
from opendwm_tpu.fs.czip import RangeReaderIO


@register(
    "CombinedTarFileSystem", aliases=("dwm.fs.ctar.CombinedTarFileSystem",)
)
class CombinedTarFileSystem(fsspec.AbstractFileSystem):
    protocol = "ctar"

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
                with self.fs.open(archive, "rb") as f:
                    tf = tarfile.open(fileobj=f, mode="r:")
                    for member in tf:
                        if not member.isfile():
                            continue
                        self._index[member.name] = (
                            archive,
                            {
                                "offset_data": member.offset_data,
                                "size": member.size,
                            },
                        )

    def _archive_fp(self, archive: str):
        key = (os.getpid(), archive)
        if key not in self._fp_cache:
            self._fp_cache[key] = self.fs.open(archive, "rb")
        return self._fp_cache[key]

    def ls(self, path, detail=True, **kwargs):
        path = path.strip("/")
        entries = set()
        for name in self._index:
            if not path or name.startswith(path + "/"):
                rest = name[len(path) + 1 if path else 0:]
                first = rest.split("/")[0]
                entries.add(
                    (path + "/" + first if path else first, "/" in rest)
                )
        out = []
        for name, is_dir in sorted(entries):
            if detail:
                out.append({
                    "name": name,
                    "type": "directory" if is_dir else "file",
                    "size": None if is_dir else self._index[name][1]["size"],
                })
            else:
                out.append(name)
        return out

    def info(self, path, **kwargs):
        if path in self._index:
            return {
                "name": path, "type": "file",
                "size": self._index[path][1]["size"],
            }
        if self.ls(path, detail=False):
            return {"name": path, "type": "directory", "size": None}
        raise FileNotFoundError(path)

    def _open(self, path, mode="rb", **kwargs):
        if "r" not in mode:
            raise NotImplementedError("read-only filesystem")
        if path not in self._index:
            raise FileNotFoundError(path)
        archive, meta = self._index[path]
        fp = self._archive_fp(archive)
        start = meta["offset_data"]
        return io.BufferedReader(
            RangeReaderIO(fp, start, start + meta["size"])
        )
