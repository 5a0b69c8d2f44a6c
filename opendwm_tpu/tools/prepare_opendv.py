"""Prepare OpenDV caption annotations as a time-keyed description JSON.

Capability parity with reference src/dwm/tools/prepare_opendv.py:1-55: join
the OpenDV-YouTube-Language per-clip annotations (blip caption + command)
with the official video metas, keyed ``{videoid}.{t_ms}`` where ``t`` is the
clip's first-frame time shifted by the video's ``start_discard`` — the key
format consumed by the OpenDV dataset's caption lookup.

Annotations come from either the HuggingFace dataset (when ``datasets`` is
installed and reachable) or a local JSON/JSONL dump (``--annotation-path``),
so the tool also works offline.

    python -m opendwm_tpu.tools.prepare_opendv \
        --meta-path metas.json --annotation-path annos.jsonl -o captions.json
"""

from __future__ import annotations

import argparse
import json


def create_parser():
    parser = argparse.ArgumentParser(
        description="Make the time-keyed caption JSON for OpenDV videos."
    )
    parser.add_argument("--meta-path", required=True,
                        help="Official OpenDV-2K video metas JSON.")
    parser.add_argument(
        "--annotation-path", default=None,
        help="Local OpenDV-YouTube-Language dump (.json list or .jsonl). "
             "When omitted, tries the HuggingFace dataset.",
    )
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--split", default=None,
                        help="Optional meta split filter.")
    return parser


def caption_key(videoid: str, first_frame: str, start_discard: float,
                default_fps: float = 10.0, time_base: float = 0.001) -> str:
    """``{videoid}.{t}`` with t in time_base units (reference :43-49)."""
    frame_index = int(str(first_frame).split(".")[0])
    t = int((frame_index / default_fps + start_discard) / time_base)
    return f"{videoid}.{t}"


def build_descriptions(annotations, meta_dict) -> dict:
    """annotations: iterable of records with folder/first_frame/blip/cmd."""
    out = {}
    for rec in annotations:
        videoid = rec["folder"].split("/")[-1]
        if videoid not in meta_dict:
            continue
        key = caption_key(
            videoid, rec["first_frame"],
            meta_dict[videoid].get("start_discard", 0.0),
        )
        out[key] = {
            "image_description": rec.get("blip", ""),
            "action": rec.get("cmd", ""),
        }
    return out


def load_annotations(path: str):
    if path.endswith(".jsonl"):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    with open(path) as f:
        data = json.load(f)
    return data if isinstance(data, list) else data.get("data", [])


def main(args=None):
    args = args or create_parser().parse_args()
    with open(args.meta_path, encoding="utf-8") as f:
        meta_dict = {
            m["videoid"]: m
            for m in json.load(f)
            if args.split is None or m.get("split") == args.split
        }

    if args.annotation_path:
        annotations = load_annotations(args.annotation_path)
    else:
        from datasets import load_dataset  # requires network access

        ds = load_dataset("OpenDriveLab/OpenDV-YouTube-Language")
        annotations = [rec for sp in ("train", "validation")
                       for rec in ds[sp]]

    result = build_descriptions(annotations, meta_dict)
    with open(args.output_path, "w", encoding="utf-8") as f:
        json.dump(result, f)
    print(f"wrote {len(result)} captions to {args.output_path}")


if __name__ == "__main__":
    main()
