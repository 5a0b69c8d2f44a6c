"""Train CLI: step loop, in-train validation evaluation (train.py).

The reference wires a validation dataloader into the train loop and calls
``evaluate_pipeline`` every ``--evaluation-steps`` (reference
src/dwm/train.py:202-208); round-1 passed no batches so periodic eval was
a silent no-op — these tests pin the wiring.
"""

import json
import os

import pytest

from opendwm_tpu.train import create_parser, main

CFG = os.path.join(
    os.path.dirname(__file__), "..", "configs", "ctsd",
    "ctsd_35_6views_video_synthetic.json",
)


@pytest.mark.slow
class TestTrainCLI:
    def test_train_logs_evaluation_scalars_that_move(self, tmp_path):
        with open(CFG) as f:
            config = json.load(f)
        # Shrink for CI: 2 layers, 6 steps, eval every 3.
        config["pipeline"]["model"]["num_layers"] = 2
        config["pipeline"]["model"]["dual_attention_layers"] = [0]
        config["pipeline"]["model"]["crossview_block_layers"] = [0]
        config["pipeline"]["model"]["temporal_block_layers"] = [1]
        config["pipeline"]["inference_config"]["inference_steps"] = 2
        config["train_steps"] = 6
        config["evaluation_batches"] = 2
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(config))

        args = create_parser().parse_args([
            "-c", str(cfg_path), "-o", str(tmp_path / "out"),
            "--log-steps", "3", "--evaluation-steps", "3",
            "--max-steps", "6",
        ])
        main(args)

        events = [
            json.loads(line)
            for line in open(tmp_path / "out" / "log" / "events.jsonl")
        ]
        evals = [e for e in events if "evaluation/fid_proxy" in e]
        assert len(evals) == 2, f"expected 2 eval logs, got {events}"
        # The metric is computed from real generations: values are finite
        # and respond to training (not a constant no-op).
        vals = [e["evaluation/fid_proxy"] for e in evals]
        assert all(v == v and abs(v) < 1e9 for v in vals)
        assert vals[0] != vals[1]
        # Train losses were logged too.
        assert any("sd_loss" in e for e in events)
