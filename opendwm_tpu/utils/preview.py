"""Preview composition + media export (host-side).

Reference src/dwm/utils/preview.py: grid layout of GT/3dbox/hdmap/generated
frames per view (:6-43), LiDAR BEV compositor (:46-78), H.264 mux via PyAV
(:81-99). PyAV is absent from this image, so video export falls back to an
animated GIF (or per-frame PNGs) with the same call signature.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

try:
    import av  # noqa: F401

    _HAS_AV = True
except ImportError:  # pragma: no cover
    _HAS_AV = False


def make_ctsd_preview_tensor(
    rows: Sequence[np.ndarray], max_views_per_row: Optional[int] = None
) -> np.ndarray:
    """Stack condition/GT/generated rows into one preview frame sequence.

    Each row: (t, v, H, W, 3) float in [0, 1]. Returns (t, H_total, W_total,
    3) where views tile horizontally and rows tile vertically (reference
    :6-43 semantics).
    """
    stacked = []
    for row in rows:
        if row is None:
            continue
        t, v, h, w, c = row.shape
        stacked.append(
            row.transpose(0, 2, 1, 3, 4).reshape(t, h, v * w, c)
        )
    return np.concatenate(stacked, axis=1)


def make_lidar_bev_preview(
    voxel_rows: Sequence[np.ndarray], colors: Optional[list] = None
) -> np.ndarray:
    """Compose BEV occupancy maps (each (t, D, H, W)) side by side into
    (t, H, n*W, 3) grayscale-ish previews (max over z)."""
    frames = []
    for row in voxel_rows:
        bev = row.max(axis=1)  # (t, H, W)
        frames.append(np.repeat(bev[..., None], 3, axis=-1))
    return np.concatenate(frames, axis=2)


def save_tensor_to_video(
    path: str, fps: float, frames: np.ndarray
) -> str:
    """frames: (t, H, W, 3) float in [0,1]. Uses H.264 via PyAV when
    available (reference :81-99), else animated GIF with the same name
    stem. Returns the actual path written."""
    frames8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if _HAS_AV and path.endswith(".mp4"):
        import av

        container = av.open(path, "w")
        stream = container.add_stream("libx264", rate=round(fps))
        stream.width = frames8.shape[2]
        stream.height = frames8.shape[1]
        stream.pix_fmt = "yuv420p"
        for frame in frames8:
            f = av.VideoFrame.from_ndarray(frame, format="rgb24")
            for packet in stream.encode(f):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
        container.close()
        return path
    if not _HAS_PIL:
        raise RuntimeError("Neither PyAV nor PIL available for media export")
    gif_path = os.path.splitext(path)[0] + ".gif"
    images = [Image.fromarray(f) for f in frames8]
    images[0].save(
        gif_path, save_all=True, append_images=images[1:],
        duration=int(1000 / max(fps, 1)), loop=0,
    )
    return gif_path


def save_tensor_to_image(path: str, image: np.ndarray) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(
        (np.clip(image, 0, 1) * 255).astype(np.uint8)
    ).save(path)
    return path
