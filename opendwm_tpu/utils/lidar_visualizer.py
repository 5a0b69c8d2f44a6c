"""LiDAR visualization (BEV renderer).

The reference's visualizer (src/dwm/utils/lidar_visualizer.py, 326+922 LoC)
is an interactive open3d app; open3d is not in this image, so this module
renders the same content — points, 3D boxes, map lines — to BEV images with
PIL, and exposes an open3d hook that activates when the package exists.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    from PIL import Image, ImageDraw

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

try:
    import open3d  # noqa: F401

    HAS_OPEN3D = True
except ImportError:  # pragma: no cover
    HAS_OPEN3D = False


class BEVRenderer:
    """Top-down renderer: world (x fwd, y left) → image pixels."""

    def __init__(
        self,
        image_size: int = 640,
        meters: float = 100.0,
        background=(0, 0, 0),
    ):
        self.size = image_size
        self.scale = image_size / meters
        self.background = background

    def _to_px(self, xy: np.ndarray) -> np.ndarray:
        cx = cy = self.size / 2
        px = cx + xy[..., 0] * self.scale
        py = cy - xy[..., 1] * self.scale
        return np.stack([px, py], -1)

    def render(
        self,
        points: Optional[np.ndarray] = None,
        points_mask: Optional[np.ndarray] = None,
        boxes: Optional[Sequence] = None,   # [(corners (8,3) or (4,2), color)]
        lines: Optional[Sequence] = None,   # [((N,2) xy polyline, color)]
        point_color=(180, 180, 180),
        height_colormap: bool = True,
    ):
        img = Image.new("RGB", (self.size, self.size), self.background)
        draw = ImageDraw.Draw(img)
        if lines:
            for poly, color in lines:
                px = self._to_px(np.asarray(poly))
                draw.line(
                    [tuple(p) for p in px], fill=tuple(color), width=2
                )
        if points is not None:
            pts = np.asarray(points)
            if points_mask is not None:
                pts = pts[np.asarray(points_mask)]
            px = self._to_px(pts[:, :2])
            keep = (
                (px[:, 0] >= 0) & (px[:, 0] < self.size)
                & (px[:, 1] >= 0) & (px[:, 1] < self.size)
            )
            px = px[keep].astype(int)
            arr = np.array(img)
            if height_colormap and pts.shape[1] > 2:
                z = np.clip((pts[keep][:, 2] + 3) / 6, 0, 1)
                colors = np.stack([
                    (z * 255), np.full_like(z, 120), ((1 - z) * 255)
                ], -1).astype(np.uint8)
                arr[px[:, 1], px[:, 0]] = colors
            else:
                arr[px[:, 1], px[:, 0]] = point_color
            img = Image.fromarray(arr)
            draw = ImageDraw.Draw(img)
        if boxes:
            for corners, color in boxes:
                corners = np.asarray(corners)
                if corners.shape[-1] >= 2:
                    bev = self._to_px(corners[:, :2])
                    hull = bev[:4] if len(bev) >= 4 else bev
                    draw.polygon(
                        [tuple(p) for p in hull], outline=tuple(color),
                        width=2,
                    )
        return img


def render_sequence(
    point_frames: Sequence[np.ndarray],
    masks: Optional[Sequence] = None,
    **kwargs,
) -> list:
    renderer = BEVRenderer(**kwargs)
    out = []
    for i, pts in enumerate(point_frames):
        mask = masks[i] if masks is not None else None
        out.append(renderer.render(points=pts, points_mask=mask))
    return out
