"""The one-command weight-landing path runs end-to-end without weights."""

import json
import os

import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


def test_dry_run_converts_and_verifies_everything(tmp_path):
    from opendwm_tpu.convert.run_all import main

    out = tmp_path / "landed"
    main(["--dry-run", "--output", str(out)])
    with open(out / "WEIGHTS_PARITY.json") as f:
        report = json.load(f)
    by_kind = {e["kind"]: e for e in report["entries"]}
    assert set(by_kind) == {"ctsd_dit", "ctsd_unet", "vae", "clip", "t5"}
    for kind, entry in by_kind.items():
        assert entry["status"] == "verified", (kind, entry)
        assert entry["check"]["finite"], kind
        assert entry["n_params"] > 0
        assert os.path.isdir(entry["out_path"]), kind
