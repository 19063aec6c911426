"""Plot training curves from a run's metrics.jsonl.

Reference: ``examples/view_training_curve.py:12-80`` (plots Pickleogger
pkls); here the logger writes JSONL (``utils/logging.py``).

    python examples/view_training_curve.py <save_root>/runs/<run>/metrics.jsonl
"""

import json
import os
import sys


def main(path: str, out: str | None = None):
    rows = [json.loads(l) for l in open(path)]
    if not rows:
        raise SystemExit(f"no metrics in {path}")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [k for k in rows[0] if k != "epoch"]
    epochs = [r.get("epoch", i) for i, r in enumerate(rows)]
    groups = {
        "loss": [k for k in keys if "loss" in k],
        "accuracy": [k for k in keys if "top" in k],
        "other": [k for k in keys if "loss" not in k and "top" not in k],
    }
    groups = {g: ks for g, ks in groups.items() if ks}
    fig, axes = plt.subplots(nrows=len(groups), figsize=(10, 4 * len(groups)),
                             squeeze=False)
    for ax, (g, ks) in zip(axes[:, 0], groups.items()):
        for k in ks:
            ax.plot(epochs, [r.get(k) for r in rows], label=k)
        ax.set_xlabel("epoch")
        ax.set_ylabel(g)
        ax.legend()
        ax.grid(True, alpha=0.3)
    out = out or os.path.join(os.path.dirname(path), "training_curve.png")
    plt.savefig(out, bbox_inches="tight")
    print("saved", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
