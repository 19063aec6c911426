"""Sensor geometry: 2-D channel locations for spatial attention.

Reference: ``meg_decoding/utils/layout.py`` (``ch_locations_2d``) resolves
per-dataset sensor layouts via MNE (Brennan: ``easycap-M10`` standard montage
minus broken channel 29, ``layout.py:9-18``; Gwilliams: layout of the first
BIDS recording, ``layout.py:20-32``; GOD: ``data/GOD/montage.csv`` first two
of three coords filtered to the ROI, ``layout.py:34-36`` +
``matlab_utils/load_meg.py:133-143``), then min-max normalizes and rescales
into ``[0.1, 0.9]`` (``layout.py:42-45``).

MNE is not available in this image, so layouts resolve in priority order:

1. ``cfg.layout_csv`` — explicit CSV of per-channel coordinates (2 or 3 cols).
2. GOD — ``cfg.montage_path`` CSV (same format as the reference's
   ``montage.csv``) filtered to the ROI channels.
3. Brennan / Gwilliams without a CSV — a deterministic synthetic cap layout
   (concentric rings over the scalp disc).  This preserves the *structure*
   (smooth 2-D geometry for the Fourier attention basis) but not MNE's exact
   coordinates; pass ``layout_csv`` exported from MNE for exact parity.
"""

from __future__ import annotations

import csv

import numpy as np

__all__ = ["ch_locations_2d", "normalize_locations", "synthetic_cap_locations"]


def normalize_locations(loc: np.ndarray) -> np.ndarray:
    """Min-max normalize each axis then rescale into [0.1, 0.9].

    Mirrors reference ``layout.py:42-45`` ("keep a margin of 0.1 on each
    side" since the Fourier attention basis is periodic).
    """
    loc = np.asarray(loc, dtype=np.float32)
    loc = (loc - loc.min(axis=0)) / (loc.max(axis=0) - loc.min(axis=0))
    return (loc * 0.8 + 0.1).astype(np.float32)


def synthetic_cap_locations(num_channels: int, seed: int = 0) -> np.ndarray:
    """Deterministic concentric-ring layout on the unit disc (cap-like)."""
    # sunflower (Vogel) spiral: uniform over the disc, no two points coincide
    idx = np.arange(num_channels, dtype=np.float64) + 0.5
    r = np.sqrt(idx / num_channels)
    theta = idx * (np.pi * (3.0 - np.sqrt(5.0)))
    loc = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    return loc.astype(np.float32)


def _read_csv_coords(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row:
                continue
            rows.append([float(v) for v in row])
    return np.asarray(rows, dtype=np.float32)


def ch_locations_2d(cfg, roi_channels: list[int] | None = None) -> np.ndarray:
    """Resolve normalized (C, 2) sensor coordinates for ``cfg.dataset``."""
    explicit = cfg.get("layout_csv") if hasattr(cfg, "get") else None
    if explicit:
        loc = _read_csv_coords(explicit)[:, :2]
        if roi_channels is not None:
            loc = loc[np.asarray(roi_channels)]
        return normalize_locations(loc)

    dataset = cfg.dataset
    if dataset == "GOD":
        montage = _read_csv_coords(cfg.montage_path)  # (C, 3)
        if roi_channels is None:
            from meg_decoding_tpu.data.roi import roi as _roi

            roi_channels = _roi(cfg)
        loc = montage[np.asarray(roi_channels), :2]
        return normalize_locations(loc)

    if dataset == "Brennan2018":
        # easycap-M10 is a 61-electrode equidistant cap; reference drops
        # broken channel 29 → 60 channels (layout.py:16-18).  A different
        # ``num_channels`` (e.g. synthetic data) skips the deletion.
        num = int(cfg.get("num_channels", 60) or 60)
        if num == 60:
            loc = synthetic_cap_locations(61)
            loc = np.delete(loc, 28, axis=0)
        else:
            loc = synthetic_cap_locations(num)
        return normalize_locations(loc)

    if dataset == "Gwilliams2022":
        num = int(cfg.get("num_channels", 208) or 208)
        return normalize_locations(synthetic_cap_locations(num))

    raise ValueError(f"unknown dataset {dataset!r}")
