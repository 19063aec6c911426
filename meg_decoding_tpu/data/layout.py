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
   ``montage.csv``) filtered to the ROI channels; falls back to the packaged
   copy of the real Ricoh montage (``data/layouts/god_montage.csv``).
3. Brennan — packaged easycap-M10 coordinates
   (``data/layouts/easycap_M10.csv``): a geometric RECONSTRUCTION of the
   61-electrode equidistant montage (rings of 1/6/12/18/24 electrodes at
   equidistant inclinations, azimuthal-equidistant projected like MNE's
   ``find_layout``), minus broken channel 29 (reference ``layout.py:16-18``).
   Regenerate with exact MNE values via ``scripts/export_mne_layouts.py`` on
   a machine with MNE installed.
4. Anything else without a CSV — a deterministic synthetic cap layout
   (Vogel spiral over the scalp disc), structure-preserving only.
"""

from __future__ import annotations

import csv
import os
import warnings

import numpy as np

__all__ = ["ch_locations_2d", "easycap_m10_locations", "normalize_locations",
           "synthetic_cap_locations"]

LAYOUTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "layouts")


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


def easycap_m10_locations() -> np.ndarray:
    """Packaged (61, 2) easycap-M10 coordinates (see module docstring:
    geometric reconstruction unless regenerated from MNE)."""
    return _read_csv_coords(os.path.join(LAYOUTS_DIR, "easycap_M10.csv"))


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
        montage_path = cfg.get("montage_path") if hasattr(cfg, "get") else None
        if not (montage_path and os.path.exists(montage_path)):
            montage_path = os.path.join(LAYOUTS_DIR, "god_montage.csv")
        montage = _read_csv_coords(montage_path)  # (C, 3)
        if roi_channels is None:
            from meg_decoding_tpu.data.roi import roi as _roi

            roi_channels = _roi(cfg)
        loc = montage[np.asarray(roi_channels), :2]
        return normalize_locations(loc)

    if dataset == "Brennan2018":
        # easycap-M10 is a 61-electrode equidistant cap; reference drops
        # broken channel 29 → 60 channels (layout.py:16-18).  A different
        # ``num_channels`` (e.g. synthetic data) falls back to a synthetic
        # cap of that size.
        num = int(cfg.get("num_channels", 60) or 60)
        if num in (60, 61):
            loc = easycap_m10_locations()
            if num == 60:
                loc = np.delete(loc, 28, axis=0)
        else:
            warnings.warn(
                f"Brennan layout requested for {num} channels — the easycap "
                "M10 montage has 61; using a synthetic cap (accuracy parity "
                "needs real geometry)")
            loc = synthetic_cap_locations(num)
        return normalize_locations(loc)

    if dataset == "Gwilliams2022":
        num = int(cfg.get("num_channels", 208) or 208)
        # prefer the REAL sensor geometry the cache builder extracted from
        # the first BIDS recording (scripts/build_gwilliams_cache.py
        # extract_layout — reference layout.py:20-32 semantics, persisted as
        # layout.npy so training needs no MNE)
        cache_dir = cfg.get("cache_dir") if hasattr(cfg, "get") else None
        layout_path = cache_dir and os.path.join(cache_dir, "layout.npy")
        if layout_path and os.path.exists(layout_path):
            loc = np.asarray(np.load(layout_path), dtype=np.float32)[:, :2]
            if loc.shape[0] >= num:
                return normalize_locations(loc[:num])
            warnings.warn(
                f"cache layout.npy has {loc.shape[0]} channels but the data "
                f"has {num} — falling back to a synthetic cap")
        else:
            warnings.warn(
                "no cache-resident Gwilliams sensor layout (layout.npy) — "
                "using a synthetic cap.  SpatialAttention needs the real "
                "geometry for accuracy parity; rebuild the cache with "
                "scripts/build_gwilliams_cache.py (which persists the BIDS "
                "layout) or point cfg.layout_csv at coordinates.")
        return normalize_locations(synthetic_cap_locations(num))

    raise ValueError(f"unknown dataset {dataset!r}")
