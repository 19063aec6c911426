"""Zero-data quickstart: the full framework tour with no datasets on disk.

Generates a tiny synthetic dataset in the REAL on-disk format of the chosen
workload (``meg_decoding_tpu/data/synthetic.py``) — Gwilliams2022
preprocessed cache (default), GOD Brainstorm .mat sessions, or Brennan raw
EEG — trains the matching encoder contrastively for a few epochs, evaluates
retrieval, exports a deployable serving artifact (jax.export / StableHLO),
and calls the loaded artifact: every step through the same public entry
points real-data runs use.

    # CPU (~2 min):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
        python examples/quickstart_synthetic.py --out /tmp/quickstart
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
        python examples/quickstart_synthetic.py --dataset god
    # or on the attached TPU (first compile is slow through the relay):
    python examples/quickstart_synthetic.py --out /tmp/quickstart
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMMON = dict(batch_size=16, use_sampler=True, test_size=16,
              lr_scheduler="none", init_temperature=5.1, seed=0)
SPEECH_EXTRA = dict(model="brain_encoder", D1=16, D2=24, F=16, K=8,
                    d_drop=0.1, seq2seq=True, updates=20, lr=3e-4)


def _make_cfg(dataset: str, out: str, epochs: int):
    from meg_decoding_tpu.data.synthetic import (
        make_synthetic_brennan_raw,
        make_synthetic_god_dataset,
        make_synthetic_gwilliams_cache,
    )

    if dataset == "gwilliams":
        cfg = make_synthetic_gwilliams_cache(os.path.join(out, "cache"))
        extra = SPEECH_EXTRA
    elif dataset == "brennan":
        cfg = make_synthetic_brennan_raw(os.path.join(out, "data_root"))
        extra = SPEECH_EXTRA
    elif dataset == "god":
        cfg = make_synthetic_god_dataset(os.path.join(out, "god"),
                                         subjects=("sbj01", "sbj02"))
        extra = dict(model="linear", F=16, scp=True, num_subjects=2,
                     training_mode="split", updates=10, lr=1e-3)
    else:
        raise SystemExit(f"unknown --dataset {dataset!r}")
    for k, v in {**COMMON, **extra}.items():
        setattr(cfg, k, v)
    cfg.epochs = epochs
    cfg.save_root = os.path.join(out, "run")
    cfg.set_dotted("loss.kind", "clip")
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="quickstart_out")
    ap.add_argument("--dataset", default="gwilliams",
                    choices=["gwilliams", "god", "brennan"])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--skip-export", action="store_true",
                    help="skip the serving-artifact leg")
    args = ap.parse_args(argv)
    if args.epochs < 1:
        ap.error("--epochs must be >= 1 (the tour needs a trained checkpoint)")

    # 1. a tiny synthetic dataset in the workload's real on-disk format
    cfg = _make_cfg(args.dataset, args.out, args.epochs)

    # 2. train (same dispatch as `python train.py` / meg-decode-train)
    from meg_decoding_tpu.cli.main import dispatch_evaluate, dispatch_train

    best = dispatch_train(cfg)
    print(f"[quickstart] best epoch: "
          f"top10={best.get('test_top10', float('nan')):.3f} "
          f"loss={best.get('test_loss', float('nan')):.3f}")
    assert np.isfinite(best.get("train_loss", np.nan))

    # 3. evaluate the saved checkpoint (same as `python evaluate.py`)
    results = dispatch_evaluate(cfg)
    print(f"[quickstart] evaluate: {results}")

    if not args.skip_export:
        # 4. export a deployable serving artifact and call it
        from meg_decoding_tpu.cli.export_model import run as export

        art_dir = export(cfg)
        from meg_decoding_tpu.serving import load_artifact

        served = load_artifact(art_dir)
        _, C, T = served.meta["input"]["X"]
        rng = np.random.RandomState(0)
        Z = np.asarray(served(rng.randn(4, C, T).astype(np.float32),
                              np.zeros(4, np.int32)))
        print(f"[quickstart] served artifact predicts {Z.shape} from raw "
              f"windows — done; everything under {args.out}")
    return best


if __name__ == "__main__":
    main()
