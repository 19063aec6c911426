"""Sanity-check the GOD image-feature galleries — the reference's
``notebooks/check_GOD_image_feature.ipynb`` (label/category inspection over
the feature file) as a runnable script against the .npy galleries this
framework consumes (``loss.py:149-166`` contract).

Reports: shapes, norms, duplicate-image structure, and the key property the
notebook probed — whether any TEST category also appears among the TRAIN
categories (GOD's test set is deliberately category-disjoint).

    python examples/check_god_image_features.py \
        [--train image_features_train.npy] [--test image_features.npy] \
        [--labels-train labels_train.npy] [--labels-test labels_test.npy]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def category_of(image_ids: np.ndarray) -> np.ndarray:
    """GOD image ids are <wordnet_category>.<exemplar>; the integer part is
    the category (the notebook's CatID)."""
    return np.floor(np.asarray(image_ids, dtype=np.float64)).astype(np.int64)


def check(train_feats, test_feats, train_ids=None, test_ids=None):
    out = {}
    out["train_shape"] = tuple(train_feats.shape)
    out["test_shape"] = tuple(test_feats.shape)
    assert train_feats.shape[1] == test_feats.shape[1], "feature dims differ"
    tn = np.linalg.norm(train_feats, axis=1)
    out["train_norm_mean"] = float(tn.mean())
    out["zero_rows"] = int((tn < 1e-8).sum())
    # duplicate feature rows = repeated presentations of the same image
    uniq = np.unique(np.round(train_feats, 6), axis=0)
    out["unique_train_rows"] = int(len(uniq))
    if train_ids is not None and test_ids is not None:
        cat_tr = set(category_of(train_ids).tolist())
        cat_te = category_of(test_ids)
        overlap = [c for c in np.unique(cat_te) if c in cat_tr]
        out["n_train_categories"] = len(cat_tr)
        out["n_test_categories"] = int(len(np.unique(cat_te)))
        out["test_categories_seen_in_train"] = overlap
        # the notebook's probe: GOD test categories are held out
        if overlap:
            print("WARNING: test categories overlap train — the zero-shot "
                  f"protocol is broken for {overlap}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default="data/GOD/image_features_train.npy")
    ap.add_argument("--test", default="data/GOD/image_features.npy")
    ap.add_argument("--labels-train", default=None)
    ap.add_argument("--labels-test", default=None)
    args = ap.parse_args()

    if os.path.exists(args.train) and os.path.exists(args.test):
        tr = np.load(args.train).astype(np.float32)
        te = np.load(args.test).astype(np.float32)
        ids_tr = np.load(args.labels_train) if args.labels_train else None
        ids_te = np.load(args.labels_test) if args.labels_test else None
    else:
        print("[check_god_image_features] gallery files not found — "
              "demonstrating on synthetic galleries")
        rng = np.random.RandomState(0)
        tr = rng.randn(1200, 512).astype(np.float32)
        te = rng.randn(50, 512).astype(np.float32)
        # synthetic ids: 150 train categories × 8 exemplars; 50 held-out cats
        ids_tr = np.repeat(np.arange(1000, 1150), 8) + 0.1
        ids_te = np.arange(2000, 2050) + 0.1

    for k, v in check(tr, te, ids_tr, ids_te).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
