"""Path-prefix filesystem wrapper (reference src/dwm/fs/dirfs.py:5-181)."""

from __future__ import annotations

from typing import Optional

import fsspec

from opendwm_tpu.config import register


@register("DirFileSystem", aliases=("dwm.fs.dirfs.DirFileSystem",))
class DirFileSystem(fsspec.AbstractFileSystem):
    protocol = "dir"

    def __init__(
        self,
        path: str,
        fs: Optional[fsspec.AbstractFileSystem] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.path = path.rstrip("/")
        self.fs = fs or fsspec.filesystem("file")

    def _join(self, p: str) -> str:
        p = p.lstrip("/")
        return f"{self.path}/{p}" if p else self.path

    def _strip(self, p: str) -> str:
        if p.startswith(self.path):
            return p[len(self.path):].lstrip("/")
        return p

    def ls(self, path, detail=True, **kwargs):
        out = self.fs.ls(self._join(path), detail=detail, **kwargs)
        if detail:
            return [dict(i, name=self._strip(i["name"])) for i in out]
        return [self._strip(i) for i in out]

    def info(self, path, **kwargs):
        i = dict(self.fs.info(self._join(path), **kwargs))
        i["name"] = self._strip(i["name"])
        return i

    def exists(self, path, **kwargs):
        return self.fs.exists(self._join(path), **kwargs)

    def _open(self, path, mode="rb", **kwargs):
        return self.fs.open(self._join(path), mode=mode, **kwargs)
