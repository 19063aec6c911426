"""Regenerate the packaged sensor layouts from MNE (exact parity).

The image this framework ships in has no MNE and no network, so
``meg_decoding_tpu/data/layouts/easycap_M10.csv`` is a geometric
reconstruction of the 61-electrode equidistant montage.  Run this script on
any machine with ``mne`` installed to overwrite it with MNE's exact
``easycap-M10`` + ``find_layout`` output — the coordinates the reference
uses (``meg_decoding/utils/layout.py:9-18``).

    python scripts/export_mne_layouts.py
"""

import os

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAYOUTS = os.path.join(REPO_ROOT, "meg_decoding_tpu", "data", "layouts")


def export_easycap_m10():
    import mne

    montage = mne.channels.make_standard_montage("easycap-M10")
    info = mne.create_info(ch_names=montage.ch_names, sfreq=512.0,
                           ch_types="eeg")
    info.set_montage(montage)
    layout = mne.channels.find_layout(info, ch_type="eeg")
    loc = layout.pos[:, :2]  # (61, 2) — channel 29 deletion happens at load
    path = os.path.join(LAYOUTS, "easycap_M10.csv")
    with open(path, "w") as f:
        for x, y in loc:
            f.write(f"{x:.8f},{y:.8f}\n")
    print(f"wrote {path} ({loc.shape[0]} channels, exact MNE values)")


def export_gwilliams_layout(bids_root: str):
    """2-D layout of the first Gwilliams BIDS recording (reference
    layout.py:20-32); writes a layout_csv usable via ``cfg.layout_csv``."""
    import mne
    import mne_bids

    bids_path = mne_bids.BIDSPath(subject="01", session="0", task="0",
                                  datatype="meg", root=bids_root)
    raw = mne_bids.read_raw_bids(bids_path)
    layout = mne.channels.find_layout(raw.info, ch_type="meg")
    loc = layout.pos[:, :2]
    path = os.path.join(LAYOUTS, "gwilliams_meg.csv")
    with open(path, "w") as f:
        for x, y in loc:
            f.write(f"{x:.8f},{y:.8f}\n")
    print(f"wrote {path} ({loc.shape[0]} channels)")


def check_easycap_m10(atol: float = 0.02) -> bool:
    """Self-certifying oracle: compare the COMMITTED easycap_M10.csv against
    MNE's exact output (after per-axis min-max normalization, which is what
    the model consumes — ``normalize_locations``).  Run wherever MNE exists;
    exits non-zero on disagreement so a deployment's CI catches a drifted
    reconstruction."""
    import mne

    montage = mne.channels.make_standard_montage("easycap-M10")
    info = mne.create_info(ch_names=montage.ch_names, sfreq=512.0,
                           ch_types="eeg")
    info.set_montage(montage)
    layout = mne.channels.find_layout(info, ch_type="eeg")
    ref = layout.pos[:, :2]

    import sys

    sys.path.insert(0, REPO_ROOT)  # make meg_decoding_tpu importable from any cwd
    from meg_decoding_tpu.data.layout import (
        easycap_m10_locations,
        normalize_locations,
    )

    got = normalize_locations(easycap_m10_locations())
    want = normalize_locations(ref)
    err = np.abs(got - want).max()
    ok = bool(err <= atol)
    print(f"easycap-M10 committed-vs-MNE max abs error (normalized): "
          f"{err:.5f} ({'OK' if ok else f'FAIL > {atol}'})")
    return ok


def write_golden():
    """Persist MNE's exact easycap-M10 layout as a committed golden file
    (``data/golden/easycap_M10_mne.csv``) so the zero-MNE CI can compare
    the reconstruction against it forever after
    (tests/test_layouts.py::test_reconstruction_matches_mne_golden)."""
    import mne

    montage = mne.channels.make_standard_montage("easycap-M10")
    info = mne.create_info(ch_names=montage.ch_names, sfreq=512.0,
                           ch_types="eeg")
    info.set_montage(montage)
    layout = mne.channels.find_layout(info, ch_type="eeg")
    loc = layout.pos[:, :2]
    golden_dir = os.path.join(REPO_ROOT, "meg_decoding_tpu", "data", "golden")
    os.makedirs(golden_dir, exist_ok=True)
    path = os.path.join(golden_dir, "easycap_M10_mne.csv")
    with open(path, "w") as f:
        for x, y in loc:
            f.write(f"{x:.8f},{y:.8f}\n")
    print(f"wrote {path} ({loc.shape[0]} channels, exact MNE values)")


if __name__ == "__main__":
    import argparse
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--gwilliams-bids-root", default=None)
    ap.add_argument("--check", action="store_true",
                    help="verify the committed CSV against MNE instead of "
                         "overwriting it")
    ap.add_argument("--write-golden", action="store_true",
                    help="persist MNE's exact layout as a committed golden "
                         "file for the zero-MNE CI to check against")
    args = ap.parse_args()
    if args.check:
        sys.exit(0 if check_easycap_m10() else 1)
    if args.write_golden:
        write_golden()
        sys.exit(0)
    export_easycap_m10()
    if args.gwilliams_bids_root:
        export_gwilliams_layout(args.gwilliams_bids_root)
