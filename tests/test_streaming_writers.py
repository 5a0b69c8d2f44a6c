"""Streaming sinks: MJPEG-over-HTTP server, PNG fallback, writer routing
(streaming.py; RTSP mux mirrors reference streaming.py:98-141 and is
exercised when PyAV is installed)."""

import os
import socket
import urllib.request

import numpy as np

from opendwm_tpu.streaming import (
    MJPEGServer,
    PNGWriter,
    make_writer,
    merge_multiview_images,
)


def free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestWriters:
    def test_merge_multiview(self):
        frame = np.random.default_rng(0).uniform(0, 1, (3, 4, 5, 3))
        strip = merge_multiview_images(frame)
        assert strip.shape == (4, 15, 3)
        np.testing.assert_allclose(strip[:, 5:10], frame[1])

    def test_mjpeg_server_streams_frames(self):
        port = free_port()
        server = MJPEGServer(port, fps=10)
        try:
            img = np.zeros((8, 8, 3), np.uint8)
            img[::2] = 255
            server.write(img)
            req = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5
            )
            assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
            server.write(img)  # wake the handler loop
            head = req.read(200)
            assert b"--frame" in head
            assert b"image/jpeg" in head
            # JPEG SOI marker appears after the part headers
            body = head + req.read(400)
            assert b"\xff\xd8" in body
        finally:
            server.close()

    def test_png_writer(self, tmp_path):
        w = PNGWriter(str(tmp_path))
        w.write(np.zeros((4, 4, 3), np.uint8))
        w.write(np.zeros((4, 4, 3), np.uint8))
        assert sorted(os.listdir(tmp_path)) == [
            "frame_000000.png", "frame_000001.png"
        ]

    def test_make_writer_routing(self, tmp_path):
        # http:// → MJPEG server; None → PNG; rtsp:// without PyAV → PNG.
        port = free_port()
        w = make_writer(f"http://:{port}", str(tmp_path), 10, 8, 8)
        assert isinstance(w, MJPEGServer)
        w.close()
        w = make_writer(None, str(tmp_path), 10, 8, 8)
        assert isinstance(w, PNGWriter)
        try:
            import av  # noqa: F401

            have_av = True
        except ImportError:
            have_av = False
        if not have_av:
            w = make_writer("rtsp://localhost/x", str(tmp_path), 10, 8, 8)
            assert isinstance(w, PNGWriter)
