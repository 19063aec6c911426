"""Dump predicted features + labels for train & test splits to .npy.

Reference: ``examples/inference.py:32-143`` — loads the trained encoder,
forwards both splits, saves ``Z_train.npy``/``Z_test.npy`` (+ labels) for
downstream analysis.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from meg_decoding_tpu.cli.evaluate_god import _build, predict
from meg_decoding_tpu.cli.main import parse_cli
from meg_decoding_tpu.train.checkpoint import CheckpointManager
from meg_decoding_tpu.train.state import create_train_state


def main():
    cfg = parse_cli(default_config_name="config_GOD")
    save_root = cfg.get("save_root", "runs_out")
    source, val, model = _build(cfg)

    from meg_decoding_tpu.train.schedules import make_optimizer

    optimizer = make_optimizer(cfg, int(cfg.get("updates", 1200)))
    example = source.gather(np.arange(min(len(source), 8)))
    abstract = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(save_root, "ckpt"))
    state, which = ckpt.load_best_or_last(abstract)
    print(f"loaded checkpoint: {which}")

    out_dir = os.path.join(save_root, "inference")
    os.makedirs(out_dir, exist_ok=True)
    for name, ds in [("train", source), ("test", val)]:
        Z = predict(cfg, model, state, ds)
        np.save(os.path.join(out_dir, f"Z_{name}.npy"), Z)
        np.save(os.path.join(out_dir, f"Y_{name}.npy"), np.asarray(ds.Y))
        if ds.labels is not None:
            np.save(os.path.join(out_dir, f"labels_{name}.npy"), np.asarray(ds.labels))
        print(f"{name}: Z {Z.shape} saved to {out_dir}")


if __name__ == "__main__":
    main()
