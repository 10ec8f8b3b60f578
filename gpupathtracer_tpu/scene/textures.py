"""Texture atlas construction (host side).

Packs all referenced material images into one atlas with simple shelf
packing. Returns the atlas image, per-slot rectangles, and the path->slot
mapping consumed by pack_materials.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from gpupathtracer_tpu.utils.io import load_image


def build_atlas(paths: List[str], base_dir: str = ".",
                max_side: int = 4096) -> Tuple[np.ndarray, np.ndarray, Dict[str, int]]:
    """Load images and shelf-pack them.

    Returns (atlas [H, W, 3] f32, rects [S, 4] i32 (x, y, w, h),
    slots {path: slot}). Missing files are skipped (their materials keep
    constant albedo). With no textures, returns a 4x4 dummy atlas.
    """
    images = []
    slots: Dict[str, int] = {}
    for p in paths:
        full = p if os.path.isabs(p) else os.path.join(base_dir, p)
        if not os.path.exists(full):
            continue
        try:
            img = load_image(full)
        except Exception:
            continue
        if img.shape[0] > max_side // 2 or img.shape[1] > max_side // 2:
            stride = max(img.shape[0] // (max_side // 2),
                         img.shape[1] // (max_side // 2)) + 1
            img = img[::stride, ::stride]
        slots[p] = len(images)
        images.append(np.ascontiguousarray(img[..., :3], np.float32))

    if not images:
        return (np.zeros((4, 4, 3), np.float32),
                np.asarray([[0, 0, 4, 4]], np.int32), {})

    # Shelf packing: sort by height, fill rows.
    order = sorted(range(len(images)), key=lambda i: -images[i].shape[0])
    atlas_w = min(max_side,
                  max(int(np.ceil(np.sqrt(sum(i.shape[0] * i.shape[1]
                                              for i in images)))),
                      max(i.shape[1] for i in images)))
    rects = [None] * len(images)
    x = y = shelf_h = 0
    for i in order:
        h, w = images[i].shape[:2]
        if x + w > atlas_w:
            y += shelf_h
            x = shelf_h = 0
        rects[i] = (x, y, w, h)
        x += w
        shelf_h = max(shelf_h, h)
    atlas_h = y + shelf_h

    atlas = np.zeros((atlas_h, atlas_w, 3), np.float32)
    for i, img in enumerate(images):
        rx, ry, w, h = rects[i]
        atlas[ry:ry + h, rx:rx + w] = img
    return atlas, np.asarray(rects, np.int32), slots
