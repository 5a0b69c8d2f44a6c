"""Repack .tar/.tgz archives as ZIP_STORED zips (reference
src/dwm/tools/tar2zip.py:24 — stored zips allow zero-copy range reads
through the czip filesystem).

    python -m opendwm_tpu.tools.tar2zip input.tgz [output.zip]
"""

from __future__ import annotations

import argparse
import os
import tarfile
import zipfile


def tar_to_zip(src: str, dst: str) -> int:
    mode = "r:gz" if src.endswith((".tgz", ".tar.gz")) else "r:"
    count = 0
    with tarfile.open(src, mode) as tf, zipfile.ZipFile(
        dst, "w", zipfile.ZIP_STORED
    ) as zf:
        for member in tf:
            if not member.isfile():
                continue
            f = tf.extractfile(member)
            zf.writestr(member.name, f.read())
            count += 1
    return count


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input")
    parser.add_argument("output", nargs="?")
    args = parser.parse_args(argv)
    out = args.output or os.path.splitext(args.input)[0] + ".zip"
    n = tar_to_zip(args.input, out)
    print(f"wrote {out} ({n} members)")


if __name__ == "__main__":
    main()
