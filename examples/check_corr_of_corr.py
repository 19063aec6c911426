"""Representational similarity analysis (RSA): MEG-vs-image corr-of-corr.

Reference: ``examples/check_corrof_corr.py:126-171`` — compute the pairwise
correlation matrix of MEG epochs (SCP features) and of the paired image
features, then correlate the two matrices' off-diagonal entries.  A positive
corr-of-corr means similar images evoke similar MEG — the signal the
contrastive decoder exploits.

    python examples/check_corr_of_corr.py --config-name config_GOD
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meg_decoding_tpu.cli.main import parse_cli
from meg_decoding_tpu.data.god import build_god_dataset
from meg_decoding_tpu.kamitani.helpers import corrmat


def rsa_corr_of_corr(X: np.ndarray, Y: np.ndarray) -> float:
    """X: (N, ...) brain epochs; Y: (N, F) stimulus features."""
    Xf = X.reshape(len(X), -1)
    cx = corrmat(Xf, Xf)
    cy = corrmat(np.asarray(Y), np.asarray(Y))
    mask = ~np.eye(len(cx), dtype=bool)
    return float(np.corrcoef(cx[mask], cy[mask])[0, 1])


def main():
    cfg = parse_cli(default_config_name="config_GOD")
    ds = build_god_dataset(cfg, "train")
    X = np.asarray(ds.X).mean(-1)  # SCP features
    r = rsa_corr_of_corr(X, np.asarray(ds.Y))
    print(f"corr-of-corr (MEG SCP vs image features): {r:.4f}")
    return r


if __name__ == "__main__":
    main()
