"""Packaged sensor layouts (VERDICT round-1 item 7).

GOD: the real Ricoh montage + region table ship with the package and resolve
without any data directory.  Brennan: the packaged easycap-M10 coordinates
(61-electrode equidistant montage, geometric reconstruction — see
scripts/export_mne_layouts.py for exact-MNE regeneration) with the
reference's channel-29 deletion (layout.py:16-18).
"""

import os

import numpy as np
import pytest

from meg_decoding_tpu.core.config import Config
from meg_decoding_tpu.data.layout import (
    ch_locations_2d,
    easycap_m10_locations,
    normalize_locations,
)
from meg_decoding_tpu.data.roi import roi


_EASYCAP_MNE_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "meg_decoding_tpu", "data", "golden", "easycap_M10_mne.csv")


class TestEasycapM10:
    def test_shape_and_vertex(self):
        loc = easycap_m10_locations()
        assert loc.shape == (61, 2)
        # site 1 is the vertex (projection origin)
        np.testing.assert_allclose(loc[0], [0.0, 0.0], atol=1e-6)

    @pytest.mark.skipif(
        not os.path.exists(_EASYCAP_MNE_GOLDEN),
        reason="no easycap_M10_mne.csv golden committed: MNE cannot run in "
               "this zero-egress image — generate with `python "
               "scripts/export_mne_layouts.py --write-golden` wherever MNE "
               "exists, commit, and this test arms itself")
    def test_reconstruction_matches_mne_golden(self):
        """The geometric reconstruction vs MNE's exact layout (normalized,
        as the model consumes it) — PARITY deviation 5 closes when this
        runs green on a committed golden."""
        ref = np.loadtxt(_EASYCAP_MNE_GOLDEN, delimiter=",")
        got = normalize_locations(easycap_m10_locations())
        want = normalize_locations(ref[:, :2])
        assert np.abs(got - want).max() <= 0.02

    def test_equidistant_ring_structure(self):
        """61 electrodes on rings of 1/6/12/18/24 at equally spaced radii —
        the equidistance property that defines the M10 arrangement."""
        loc = easycap_m10_locations()
        r = np.linalg.norm(loc, axis=1)
        counts = [1, 6, 12, 18, 24]
        start = 0
        radii = []
        for n in counts:
            ring = r[start:start + n]
            assert np.allclose(ring, ring[0], rtol=1e-4), f"ring at {start}"
            radii.append(ring[0])
            start += n
        diffs = np.diff(radii)
        assert np.allclose(diffs, diffs[0], rtol=1e-3)  # equidistant rings

    def test_nearest_neighbour_spacing_uniform(self):
        """Within-ring arc spacing stays within ~35% of the inter-ring
        spacing everywhere — the 'equidistant cap' property."""
        loc = easycap_m10_locations()
        d = np.linalg.norm(loc[:, None] - loc[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = d.min(axis=1)
        assert nn.max() / nn.min() < 1.6

    def test_brennan_default_drops_channel_29(self):
        cfg = Config({"dataset": "Brennan2018", "num_channels": 60})
        loc = ch_locations_2d(cfg)
        assert loc.shape == (60, 2)
        assert loc.min() >= 0.1 - 1e-6 and loc.max() <= 0.9 + 1e-6
        # row 28 (channel 29) removed: the normalized full montage with the
        # same deletion must match exactly
        full = easycap_m10_locations()
        expect = normalize_locations(np.delete(full, 28, axis=0))
        np.testing.assert_allclose(loc, expect, atol=1e-6)

    def test_brennan_synthetic_fallback_warns(self):
        cfg = Config({"dataset": "Brennan2018", "num_channels": 8})
        with pytest.warns(UserWarning, match="synthetic cap"):
            loc = ch_locations_2d(cfg)
        assert loc.shape == (8, 2)


class TestPackagedGOD:
    def test_montage_and_regions_resolve_without_data_dir(self):
        cfg = Config({"dataset": "GOD",
                      "region": ["occipital/left", "occipital/right"]})
        channels = roi(cfg)
        assert len(channels) > 0 and min(channels) >= 0
        loc = ch_locations_2d(cfg, roi_channels=channels)
        assert loc.shape == (len(channels), 2)
        assert loc.min() >= 0.1 - 1e-6 and loc.max() <= 0.9 + 1e-6

    def test_full_region_table_covers_160_channels(self):
        """The reference's region table: 160 channels across 5 regions × L/R
        (SURVEY §2.7)."""
        cfg = Config({"dataset": "GOD"})
        import json
        import os

        from meg_decoding_tpu.data import roi as roi_mod

        path = os.path.join(os.path.dirname(os.path.abspath(roi_mod.__file__)),
                            "layouts", "god_ch_region.json")
        table = json.load(open(path))
        all_ch = []
        for region, subs in table.items():
            for sub, chans in subs.items():
                all_ch += chans
        assert len(all_ch) == 160
        assert len(set(all_ch)) == 160  # no duplicates
        # montage covers every listed channel (1-indexed)
        from meg_decoding_tpu.data.layout import LAYOUTS_DIR, _read_csv_coords

        montage = _read_csv_coords(os.path.join(LAYOUTS_DIR, "god_montage.csv"))
        assert montage.shape[1] == 3
        assert max(all_ch) - 1 < montage.shape[0]


class TestGwilliamsCacheLayout:
    """The cache builder persists the first BIDS recording's sensor layout
    (scripts/build_gwilliams_cache.py extract_layout, reference
    layout.py:20-32); ch_locations_2d must prefer it over the synthetic cap
    (VERDICT r2 missing #1)."""

    def _cfg(self, tmp_path, C=208):
        from meg_decoding_tpu.core.config import Config

        return Config({"dataset": "Gwilliams2022", "num_channels": C,
                       "cache_dir": str(tmp_path)})

    def test_prefers_cache_resident_layout(self, tmp_path):
        import numpy as np

        from meg_decoding_tpu.data.layout import (
            ch_locations_2d,
            normalize_locations,
        )

        rng = np.random.RandomState(0)
        raw = rng.rand(208, 2).astype(np.float32)
        np.save(tmp_path / "layout.npy", raw)
        loc = ch_locations_2d(self._cfg(tmp_path))
        np.testing.assert_allclose(loc, normalize_locations(raw), rtol=1e-6)
        assert loc.min() >= 0.1 - 1e-6 and loc.max() <= 0.9 + 1e-6

    def test_num_channels_slices_leading_rows(self, tmp_path):
        import numpy as np

        from meg_decoding_tpu.data.layout import (
            ch_locations_2d,
            normalize_locations,
        )

        rng = np.random.RandomState(1)
        raw = rng.rand(224, 2).astype(np.float32)  # KIT layouts can exceed 208
        np.save(tmp_path / "layout.npy", raw)
        loc = ch_locations_2d(self._cfg(tmp_path, C=208))
        np.testing.assert_allclose(loc, normalize_locations(raw[:208]),
                                   rtol=1e-6)

    def test_warns_and_falls_back_without_layout(self, tmp_path):
        import warnings as _w

        import numpy as np

        from meg_decoding_tpu.data.layout import (
            ch_locations_2d,
            normalize_locations,
            synthetic_cap_locations,
        )

        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            loc = ch_locations_2d(self._cfg(tmp_path, C=16))
        assert any("synthetic cap" in str(r.message) for r in rec)
        np.testing.assert_allclose(
            loc, normalize_locations(synthetic_cap_locations(16)), rtol=1e-6)

    def test_warns_on_channel_count_mismatch(self, tmp_path):
        import warnings as _w

        import numpy as np

        from meg_decoding_tpu.data.layout import ch_locations_2d

        np.save(tmp_path / "layout.npy", np.random.rand(100, 2).astype(np.float32))
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            loc = ch_locations_2d(self._cfg(tmp_path, C=208))
        assert any("208" in str(r.message) for r in rec)
        assert loc.shape == (208, 2)
