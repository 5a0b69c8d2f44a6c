"""Realtime streaming CLI (reference src/dwm/streaming.py:60-141).

Loop: data adapter ``query_data`` → ``send_frame_condition`` →
``receive_frame`` → compose multiview frame → encode. PyAV/RTSP output when
``av`` is importable (the reference muxes H.264 to an RTSP server); else
frames are written as numbered PNGs — same cadence, same pipeline surface.

    python -m opendwm_tpu.streaming -c config.json -o out/ \
        [--streaming-path rtsp://... --max-frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from opendwm_tpu.config import create_instance_from_config, global_state
from opendwm_tpu.train import to_device_batch


def merge_multiview_images(frame: np.ndarray) -> np.ndarray:
    """(v, h, w, c) in [0,1] → horizontal strip (reference
    streaming.py:41-63)."""
    v, h, w, c = frame.shape
    return frame.transpose(1, 0, 2, 3).reshape(h, v * w, c)


def create_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--streaming-path", default=None)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--fps", type=float, default=10.0)
    return parser


class RTSPWriter:
    """H.264 → RTSP mux via PyAV (reference streaming.py:98-141 pushes to a
    mediamtx server). Low-latency x264 settings; one video stream."""

    def __init__(self, url: str, fps: float, width: int, height: int):
        import av

        self.container = av.open(url, "w", format="rtsp")
        self.stream = self.container.add_stream(
            "libx264", rate=max(1, round(fps))
        )
        self.stream.width = width
        self.stream.height = height
        self.stream.pix_fmt = "yuv420p"
        self.stream.options = {"tune": "zerolatency", "preset": "ultrafast"}
        self._av = av

    def write(self, image_uint8: np.ndarray):
        frame = self._av.VideoFrame.from_ndarray(image_uint8, format="rgb24")
        for packet in self.stream.encode(frame):
            self.container.mux(packet)

    def close(self):
        for packet in self.stream.encode():
            self.container.mux(packet)
        self.container.close()


class MJPEGServer:
    """Dependency-free live stream: multipart-JPEG over HTTP (stdlib only).

    The reference can only stream when PyAV + an RTSP server are present;
    this fallback serves ``http://<host>:<port>/`` playable in any browser
    or ffplay. Frames are pushed with :meth:`write`; each client gets the
    most recent frame at its own pace.
    """

    def __init__(self, port: int, fps: float = 10.0):
        import http.server
        import threading

        self._lock = threading.Condition()
        self._frame: bytes = b""
        self._seq = 0
        self._fps = fps
        server_self = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame",
                )
                self.end_headers()
                last = -1
                try:
                    while True:
                        with server_self._lock:
                            server_self._lock.wait(1.0)
                            if server_self._seq == last:
                                continue
                            buf, last = (
                                server_self._frame, server_self._seq
                            )
                        self.wfile.write(
                            b"--frame\r\nContent-Type: image/jpeg\r\n"
                            + f"Content-Length: {len(buf)}\r\n\r\n".encode()
                        )
                        self.wfile.write(buf)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass

            def log_message(self, *a):  # quiet
                pass

        self.httpd = http.server.ThreadingHTTPServer(("", port), Handler)
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def write(self, image_uint8: np.ndarray):
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(image_uint8).save(buf, format="JPEG", quality=85)
        with self._lock:
            self._frame = buf.getvalue()
            self._seq += 1
            self._lock.notify_all()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class PNGWriter:
    """Frame-per-file fallback (always available)."""

    def __init__(self, output_path: str):
        self.dir = output_path
        os.makedirs(output_path, exist_ok=True)
        self.idx = 0

    def write(self, image_uint8: np.ndarray):
        from PIL import Image

        Image.fromarray(image_uint8).save(
            os.path.join(self.dir, f"frame_{self.idx:06d}.png")
        )
        self.idx += 1

    def close(self):
        pass


def make_writer(streaming_path, output_path, fps, width, height):
    """Pick the stream sink: rtsp:// → PyAV mux; http://:port or
    mjpeg://:port → stdlib MJPEG server; else numbered PNGs."""
    if streaming_path:
        if streaming_path.startswith("rtsp://"):
            try:
                return RTSPWriter(streaming_path, fps, width, height)
            except ImportError:
                print("PyAV unavailable; falling back to MJPEG/PNG")
        if streaming_path.startswith(("http://", "mjpeg://")):
            port = int(streaming_path.rsplit(":", 1)[-1].strip("/"))
            return MJPEGServer(port, fps)
    return PNGWriter(output_path)


def main(args=None):
    args = args or create_parser().parse_args()
    with open(args.config_path) as f:
        config = json.load(f)

    if "jax_platform" in config:
        jax.config.update("jax_platforms", config["jax_platform"])
    if "num_virtual_cpu_devices" in config:
        jax.config.update(
            "jax_num_cpu_devices", config["num_virtual_cpu_devices"]
        )
    if "global_state" in config:
        for key, value in config["global_state"].items():
            global_state[key] = create_instance_from_config(value)

    pipeline = create_instance_from_config(config["pipeline"])
    adapter = create_instance_from_config(config["data_adapter"])
    latent_shape = tuple(config["latent_shape"])  # (b, T, v, h, w, c)

    rng = jax.random.PRNGKey(config.get("generator_seed", 0))
    rng, k_state = jax.random.split(rng)

    import jax.numpy as jnp

    first = to_device_batch(adapter.query_data(), pipeline.mesh)
    window = latent_shape[1]

    def tile_window(x):
        # single-frame (b, 1, v, ...) conditions → full-window templates
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == 1:
            return jnp.concatenate([x] * window, axis=1)
        return x

    cond_template = {
        k: tile_window(v) for k, v in first.items()
        if k in ("encoder_hidden_states", "pooled_projections",
                 "condition_image_tensor")
    } or {"pooled_projections": jnp.zeros(
        (latent_shape[0], window, latent_shape[2], 16)
    )}
    init_batch = dict(cond_template, latents=jnp.zeros(latent_shape))
    state = pipeline.init_state(rng, init_batch)
    stream = pipeline.reset_streaming(latent_shape, cond_template, k_state)

    os.makedirs(args.output_path, exist_ok=True)
    frame_idx = 0
    writer = None
    try:
        while args.max_frames is None or frame_idx < args.max_frames:
            data = to_device_batch(adapter.query_data(), pipeline.mesh)
            stream = pipeline.send_frame_condition(stream, data)
            stream, latent, ready = pipeline.receive_frame(
                state.params, stream
            )
            if not bool(ready):
                continue
            frame = np.asarray(pipeline.decode_latents(latent))
            if frame.shape[-1] != 3:
                # no VAE attached: visualize the first 3 latent channels
                frame = frame[..., :3]
            frame = np.clip((frame + 1) / 2, 0, 1)
            image = merge_multiview_images(frame[0])
            image8 = (image * 255).astype(np.uint8)
            if writer is None:
                writer = make_writer(
                    args.streaming_path, args.output_path, args.fps,
                    image8.shape[1], image8.shape[0],
                )
            writer.write(image8)
            frame_idx += 1
            print(f"frame {frame_idx}", flush=True)
    finally:
        if writer is not None:
            writer.close()


if __name__ == "__main__":
    main()
