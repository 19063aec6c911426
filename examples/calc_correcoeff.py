"""Correlation of predicted vs ground-truth features, unit-wise and
sample-wise.

Reference: ``examples/calc_correcoeff.py`` — offline analysis of the
``examples/inference.py`` dumps.

    python examples/calc_correcoeff.py <save_root>/inference
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meg_decoding_tpu.kamitani.helpers import corrcoef


def main(inference_dir: str, split: str = "test"):
    Z = np.load(os.path.join(inference_dir, f"Z_{split}.npy"))
    Y = np.load(os.path.join(inference_dir, f"Y_{split}.npy"))
    Y = Y.reshape(len(Y), -1)
    Z = Z.reshape(len(Z), -1)
    per_sample = corrcoef(Z, Y)  # corr over units, per sample
    per_unit = corrcoef(Z.T, Y.T)  # corr over samples, per unit
    print(f"{split}: mean per-sample corr {np.nanmean(per_sample):.4f} "
          f"(± {np.nanstd(per_sample):.4f})")
    print(f"{split}: mean per-unit corr  {np.nanmean(per_unit):.4f} "
          f"(± {np.nanstd(per_unit):.4f})")
    return per_sample, per_unit


if __name__ == "__main__":
    main(*sys.argv[1:])
