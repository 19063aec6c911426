"""Golden FIR oracle artifacts for the reference preprocessing configs.

The reference's filter numerics come from ``mne.filter.filter_data``
(``meg_decoding/dataclass/god.py:131``, ``gwilliams2022.py:254-257``,
``brennan2018.py:263-266``); ``ops/fir.py`` reimplements MNE's
``_firwin_design`` because MNE is not in this image.  This script manages
two kinds of committed golden files under
``meg_decoding_tpu/data/golden/`` (SURVEY §7 "silent accuracy drift"):

* ``fir_self_*.npz`` — a pin of ``design_bandpass_fir``'s coefficients and
  frequency response at the exact reference configs, committed in-repo.
  Guards OUR implementation against silent drift; regenerate (and review
  the diff) only with an intentional filter change:
  ``python scripts/export_golden_fir.py --write-self``
* ``fir_mne_*.npz`` — MNE's exact ``create_filter`` output for the same
  configs.  Cannot be generated in this zero-egress image; run wherever
  MNE exists: ``python scripts/export_golden_fir.py --write-mne``

``--check`` validates ``design_bandpass_fir`` against every committed
golden file (exact for self-pins, tolerance for MNE) and exits non-zero on
disagreement — tests/test_golden_fir.py runs the same comparison in CI.
"""

import argparse
import hashlib
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

GOLDEN_DIR = os.path.join(REPO_ROOT, "meg_decoding_tpu", "data", "golden")

# (sfreq, l_freq, h_freq) at every reference call site:
#   Gwilliams BIDS MEG @ 1 kHz, 1–60 Hz   (gwilliams2022.py:254-257)
#   GOD Brainstorm MEG @ 1 kHz, per-config band [2, 5] (god.py:131 + yaml)
#   Brennan EEG @ 500 Hz, 1–60 Hz          (brennan2018.py:263-266)
#   post-resample rate 120 Hz, 1–60 Hz → nyq-degenerate high-pass
CONFIGS = [
    (1000.0, 1.0, 60.0),
    (1000.0, 2.0, 5.0),
    (500.0, 1.0, 60.0),
    (120.0, 1.0, 60.0),
]
N_FREQS = 4096  # response sample count (worN for scipy.signal.freqz)


def _name(kind: str, sfreq: float, l: float, h: float) -> str:
    return f"fir_{kind}_{l:g}-{h:g}Hz_at_{sfreq:g}Hz.npz"


def _response(h: np.ndarray, sfreq: float):
    from scipy.signal import freqz

    w, resp = freqz(h, worN=N_FREQS, fs=sfreq)
    return w, np.abs(resp)


def write_self():
    from meg_decoding_tpu.ops.fir import design_bandpass_fir

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sfreq, l, hf in CONFIGS:
        h = design_bandpass_fir(sfreq, l, hf)
        w, mag = _response(h, sfreq)
        path = os.path.join(GOLDEN_DIR, _name("self", sfreq, l, hf))
        np.savez(path, h=h, freqs=w, mag=mag, sfreq=sfreq, l_freq=l,
                 h_freq=hf)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()[:16]
        print(f"wrote {path} (len {len(h)}, sha256 {digest})")


def write_mne():
    import mne

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sfreq, l, hf in CONFIGS:
        h = mne.filter.create_filter(
            None, sfreq, l_freq=l, h_freq=hf, method="fir",
            fir_window="hamming", fir_design="firwin", phase="zero")
        h = np.asarray(h, dtype=np.float64)
        w, mag = _response(h, sfreq)
        path = os.path.join(GOLDEN_DIR, _name("mne", sfreq, l, hf))
        np.savez(path, h=h, freqs=w, mag=mag, sfreq=sfreq, l_freq=l,
                 h_freq=hf)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()[:16]
        print(f"wrote {path} (len {len(h)}, exact MNE values, "
              f"sha256 {digest})")


def check() -> bool:
    """Compare design_bandpass_fir against every committed golden file.
    Self-pins must match exactly (same code, same scipy); MNE goldens to
    response tolerance (windowing details may differ in the last ulps)."""
    from meg_decoding_tpu.ops.fir import design_bandpass_fir

    ok = True
    found = 0
    for fname in sorted(os.listdir(GOLDEN_DIR)):
        if not fname.startswith("fir_") or not fname.endswith(".npz"):
            continue
        found += 1
        g = np.load(os.path.join(GOLDEN_DIR, fname))
        h = design_bandpass_fir(float(g["sfreq"]), float(g["l_freq"]),
                                float(g["h_freq"]))
        exact = fname.startswith("fir_self_")
        try:
            if exact:
                np.testing.assert_allclose(h, g["h"], rtol=1e-12, atol=1e-15)
            else:
                # MNE golden: same length and near-identical response
                assert len(h) == len(g["h"]), (len(h), len(g["h"]))
                _, mag = _response(h, float(g["sfreq"]))
                np.testing.assert_allclose(mag, g["mag"], atol=1e-3)
            print(f"OK   {fname}")
        except AssertionError as e:
            print(f"FAIL {fname}: {e}")
            ok = False
    if not found:
        print("no golden files found — run --write-self first")
        return False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write-self", action="store_true")
    ap.add_argument("--write-mne", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.write_self:
        write_self()
    if args.write_mne:
        write_mne()
    if args.check or not (args.write_self or args.write_mne):
        sys.exit(0 if check() else 1)


if __name__ == "__main__":
    main()
