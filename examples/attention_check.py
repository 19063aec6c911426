"""Visualize the learned spatial-attention maps on the sensor montage.

Reference: ``notebooks/attention_check.ipynb`` — plots each output channel's
softmax attention over the (x, y) sensor positions.

    python examples/attention_check.py --config-name config_GOD n_maps=16
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meg_decoding_tpu.cli.main import parse_cli
from meg_decoding_tpu.data.layout import ch_locations_2d
from meg_decoding_tpu.data.roi import roi
from meg_decoding_tpu.models.layers import fourier_basis, spatial_attention_weights
from meg_decoding_tpu.train.checkpoint import CheckpointManager


def plot_attention_maps(z_re, z_im, loc, K, out_path, n_maps=16):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cos_t, sin_t = fourier_basis(loc, K)
    wts = np.asarray(spatial_attention_weights(z_re, z_im, cos_t, sin_t))
    n = min(n_maps, wts.shape[0])
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        if i < n:
            sc = ax.scatter(loc[:, 0], loc[:, 1], c=wts[i], cmap="viridis", s=60)
            ax.set_title(f"out ch {i}")
        ax.set_xticks([])
        ax.set_yticks([])
    plt.tight_layout()
    plt.savefig(out_path, bbox_inches="tight")
    print("saved", out_path)
    return wts


def main():
    cfg = parse_cli(default_config_name="config_GOD")
    save_root = cfg.get("save_root", "runs_out")
    roi_channels = roi(cfg) if cfg.dataset == "GOD" else None
    loc = ch_locations_2d(cfg, roi_channels)

    # pull z_re/z_im out of the latest checkpoint (works for the
    # brain_encoder family) — through CheckpointManager so the
    # best→last preference AND the .new/.old generation fallback apply
    ckpt = CheckpointManager(os.path.join(save_root, "ckpt"))
    raw, _ = ckpt.load_best_or_last(None)
    sa = raw["params"]["model"]["subject_block"]["spatial_attention"]
    z_re, z_im = np.asarray(sa["z_re"]), np.asarray(sa["z_im"])
    K = int(np.sqrt(z_re.shape[1]))
    plot_attention_maps(z_re, z_im, loc, K,
                        os.path.join(save_root, "attention_maps.png"),
                        n_maps=int(cfg.get("n_maps", 16)))


if __name__ == "__main__":
    main()
