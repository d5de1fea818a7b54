"""Detection/identification overlay, parity with ArcFaceIR50::visualize
(reference ``src/arcface.cpp:219-231``): green box + "name sim" label for
known faces (sim >= threshold), red for unknown; font scaled by box
HEIGHT over frame width — the reference's fontScaler uses its
swapped-convention x2-x1, which is the box's vertical extent
(src/arcface.cpp:221). Coordinates here are the sane (x, y) convention.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def draw_results(frame_bgr: np.ndarray, boxes: np.ndarray,
                 names: Sequence[str], sims: Sequence[float],
                 known_threshold: float = 0.65,
                 valid: np.ndarray = None) -> np.ndarray:
    import cv2

    out = frame_bgr.copy()
    frame_w = out.shape[1]
    for i, box in enumerate(np.asarray(boxes)):
        if valid is not None and not bool(np.asarray(valid)[i]):
            continue
        x1, y1, x2, y2 = (int(v) for v in box)
        sim = float(sims[i])
        color = (0, 255, 0) if sim >= known_threshold else (0, 0, 255)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2, 8, 0)
        font_scale = 0.1 + 2.0 * (y2 - y1) / frame_w
        cv2.putText(out, f"{names[i]} {sim:.6f}", (x1 + 2, y2 - 3),
                    cv2.FONT_HERSHEY_DUPLEX, font_scale, color, 1)
    return out
