"""Visualize GOD MEG recordings: raw traces, trigger-aligned epochs, and the
rest-period distribution — the manual checks of the reference's
``notebooks/vis_meg.ipynb`` as a runnable script.

Loads a session through the framework's raw path (``data/god.py``
``get_meg_data``-equivalent loaders) when GOD .mat files are configured;
otherwise demonstrates on synthetic data so the plotting is exercisable
offline.  Writes PNGs under ``--out``.

    python examples/vis_meg.py --config-name config_GOD [--out vis_meg_out]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plot(X, onsets, fs, out_dir, n_channels=8, n_epochs=6, win=(0.0, 0.5)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    t = np.arange(X.shape[1]) / fs

    # raw traces (first n channels, offset-stacked like mne's raw browser)
    fig, ax = plt.subplots(figsize=(12, 6))
    span = np.percentile(np.abs(X[:n_channels]), 99) * 2
    for c in range(min(n_channels, X.shape[0])):
        ax.plot(t, X[c] + c * span, lw=0.3)
    for o in onsets[:40]:
        ax.axvline(o, color="r", alpha=0.2, lw=0.5)
    ax.set(xlabel="time (s)", yticks=[], title="raw MEG (red = triggers)")
    fig.savefig(os.path.join(out_dir, "raw_traces.png"), dpi=120)
    plt.close(fig)

    # trigger-aligned epochs of one channel + the mean evoked response
    s0, s1 = int(win[0] * fs), int(win[1] * fs)
    windows = [X[0, int(o * fs) + s0: int(o * fs) + s1]
               for o in onsets if int(o * fs) + s1 <= X.shape[1]]
    if not windows:
        print(f"no trigger-aligned windows fit the recording "
              f"(len {X.shape[1] / fs:.1f}s, window {win}) — skipping the "
              f"epochs plot; wrote raw_traces.png under {out_dir}")
        return
    ep = np.stack(windows)
    fig, ax = plt.subplots(figsize=(8, 4))
    tt = np.arange(s0, s1) / fs
    ax.plot(tt, ep[:n_epochs].T, lw=0.5, alpha=0.6)
    ax.plot(tt, ep.mean(0), "k", lw=2, label=f"mean of {len(ep)}")
    ax.set(xlabel="time from trigger (s)", title="epochs, channel 0")
    ax.legend()
    fig.savefig(os.path.join(out_dir, "epochs_ch0.png"), dpi=120)
    plt.close(fig)

    print(f"wrote raw_traces.png + epochs_ch0.png under {out_dir} "
          f"({X.shape[0]} ch, {X.shape[1]/fs:.1f} s, {len(onsets)} triggers)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="vis_meg_out")
    args, rest = ap.parse_known_args()

    from meg_decoding_tpu.cli.main import parse_cli

    cfg = parse_cli(rest, default_config_name="config_GOD")
    try:
        # first configured session, reference path layout (data/god.py).
        # Only the LOADING is guarded — a plotting failure on real data
        # must surface, not get misreported as "no GOD session loadable"
        from meg_decoding_tpu.data.god import get_meg_data

        sub = list(cfg.subjects.keys())[0]
        scfg = cfg.subjects[sub]
        fs = float(scfg["fs"])
        root = cfg.data_root
        X, _, _, onsets = get_meg_data(
            f"{root}/{sub}/mat/{scfg['train']['mat'][0]}",
            f"{root}/{sub}/labels/{scfg['train']['labels'][0]}",
            f"{root}/{sub}/trigger/{scfg['train']['trigger'][0]}",
            num_channels=int(cfg.get("num_meg_channels", 203)),
        )
    except Exception as e:  # no GOD data in this deployment: synthetic demo
        print(f"[vis_meg] no GOD session loadable ({type(e).__name__}: {e}); "
              "plotting synthetic data")
        rng = np.random.RandomState(0)
        fs = 500.0
        X = rng.randn(16, int(fs * 30)).astype(np.float32)
        onsets = np.arange(1.0, 28.0, 0.7)
        # plant an evoked response so the epoch mean shows structure
        for o in onsets:
            i = int(o * fs)
            X[0, i:i + 100] += 3 * np.hanning(100)
    _plot(X, onsets, fs, args.out)


if __name__ == "__main__":
    main()
