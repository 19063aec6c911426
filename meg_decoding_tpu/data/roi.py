"""ROI (region-of-interest) channel selection for the GOD MEG dataset.

Reference: ``meg_decoding/matlab_utils/load_meg.py:105-120`` — maps region
strings like ``"occipital/left"`` to channel indices via a JSON file of
region → sub-region → 1-indexed channel lists, converting to 0-indexed.
"""

from __future__ import annotations

import json
import os

__all__ = ["roi"]


def roi(cfg, region=None) -> list[int]:
    """Resolve ``cfg.region`` strings to 0-indexed channel indices.

    ``region`` overrides ``cfg.region`` without mutating the config (the
    Kamitani per-region-onset sweep resolves one region at a time —
    reference examples/kamitani_regression.py:97-99 mutates ``args.region``
    in place instead).

    Falls back to the packaged region table (the reference's
    ``data/GOD/ch_region.json`` artifact) when ``cfg.ch_region_path`` is
    absent or missing on disk."""
    path = cfg.get("ch_region_path") if hasattr(cfg, "get") else None
    if not (path and os.path.exists(path)):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "layouts", "god_ch_region.json")
    with open(path) as f:
        ch_region_info = json.load(f)
    roi_channels: list[int] = []
    for reg in (cfg.region if region is None else region):
        parts = reg.split("/")
        if len(parts) != 2:
            raise ValueError(f"region must be 'region/subregion', got {reg!r}")
        region, sub = parts
        roi_channels += ch_region_info[region][sub]
    # JSON stores MATLAB-style 1-indexed channels
    return [r - 1 for r in roi_channels]
