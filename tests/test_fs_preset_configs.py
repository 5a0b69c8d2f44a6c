"""The shipped storage presets (configs/fs/*.json) construct and serve reads.

Reference configs/fs/*.json are deployment presets (reference repo root);
they are not training recipes, so the config-matrix smoke skips them and
this test exercises each one instead: local presets are instantiated
against a fixture tree with tiny zips named like the preset's ``paths``
and must read a member back; S3 presets need botocore (absent here), so
they must fail with the documented clear ImportError rather than
something cryptic.
"""

import copy
import glob
import json
import os
import zipfile

import pytest

from opendwm_tpu.config import create_instance_from_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "fs")
FS_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
assert len(FS_CONFIGS) >= 5, FS_CONFIGS

try:
    import botocore  # noqa: F401

    HAS_BOTO = True
except ImportError:
    HAS_BOTO = False


def _collect_paths(cfg):
    return cfg.get("paths", [])


def _retarget_local(node, root):
    """Point every DirFileSystem path in the preset at the fixture root."""
    if isinstance(node, dict):
        if node.get("_class_name", "").endswith("DirFileSystem"):
            node["path"] = root
        for v in node.values():
            _retarget_local(v, root)
    elif isinstance(node, list):
        for v in node:
            _retarget_local(v, root)


def _uses_s3(cfg):
    return "s3" in json.dumps(cfg)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fs_presets")
    members = {}
    for path in FS_CONFIGS:
        with open(path) as f:
            cfg = json.load(f)
        for rel in _collect_paths(cfg):
            target = root / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            member = os.path.basename(rel).replace(".zip", "") + ".txt"
            with zipfile.ZipFile(target, "w") as zf:
                zf.writestr(member, f"payload:{rel}")
            members[rel] = member
    # plain-file member for the non-zip presets
    nusc = root / "nuscenes"
    nusc.mkdir(exist_ok=True)
    (nusc / "sample.txt").write_text("plain payload")
    return str(root), members


@pytest.mark.parametrize(
    "path", FS_CONFIGS, ids=[os.path.basename(p) for p in FS_CONFIGS]
)
def test_fs_preset_constructs_and_reads(path, fixture_root):
    root, members = fixture_root
    with open(path) as f:
        cfg = json.load(f)

    if _uses_s3(cfg) and not HAS_BOTO:
        with pytest.raises(ImportError, match="botocore"):
            create_instance_from_config(copy.deepcopy(cfg))
        return

    local = copy.deepcopy(cfg)
    _retarget_local(local, root)
    fs = create_instance_from_config(local)

    rels = _collect_paths(cfg)
    if rels:  # combined-zip preset: read a member through the union fs
        rel = rels[0]
        with fs.open(members[rel], "rb") as f:
            assert f.read() == f"payload:{rel}".encode()
    elif local["_class_name"].endswith("LocalFileSystem"):
        with fs.open(os.path.join(root, "nuscenes", "sample.txt"), "rb") as f:
            assert f.read() == b"plain payload"
    else:  # DirFileSystem preset, rooted at the fixture tree
        with fs.open("nuscenes/sample.txt", "rb") as f:
            assert f.read() == b"plain payload"
