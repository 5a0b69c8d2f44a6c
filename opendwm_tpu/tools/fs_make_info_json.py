"""Build ``.info.json`` offset caches for czip/ctar archives.

Reference src/dwm/tools/fs_make_info_json.py — precomputing central-directory
(or tar header) offsets lets dataloader workers open huge archives without a
directory scan.

    python -m opendwm_tpu.tools.fs_make_info_json archive1.zip archive2.tar ...
"""

from __future__ import annotations

import argparse
import json
import tarfile

import fsspec

from opendwm_tpu.fs.czip import CombinedZipFileSystem


def make_zip_info(path: str, fs=None) -> dict:
    czfs = CombinedZipFileSystem(fs=fs, paths=[path])
    return czfs.make_info()[path]


def make_tar_info(path: str, fs=None) -> dict:
    fs = fs or fsspec.filesystem("file")
    out = {}
    with fs.open(path, "rb") as f:
        tf = tarfile.open(fileobj=f, mode="r:")
        for member in tf:
            if member.isfile():
                out[member.name] = {
                    "offset_data": member.offset_data,
                    "size": member.size,
                }
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("archives", nargs="+")
    args = parser.parse_args(argv)
    for path in args.archives:
        if path.endswith(".zip"):
            info = make_zip_info(path)
        elif path.endswith(".tar"):
            info = make_tar_info(path)
        else:
            print(f"skip {path}: unknown archive type")
            continue
        out = path + ".info.json"
        with open(out, "w") as f:
            json.dump(info, f)
        print(f"wrote {out} ({len(info)} entries)")


if __name__ == "__main__":
    main()
