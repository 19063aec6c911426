"""Zero-data quickstart: the full framework tour with no datasets on disk.

Generates a tiny synthetic Gwilliams-format cache
(``meg_decoding_tpu/data/synthetic.py`` — bit-format compatible with the
reference's preprocessed layout), trains the flagship BrainEncoder
contrastively for a few epochs, evaluates retrieval, exports a deployable
serving artifact (jax.export / StableHLO), and calls the loaded artifact —
every step through the same public entry points real-data runs use.

    # CPU (~2 min):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
        python examples/quickstart_synthetic.py --out /tmp/quickstart
    # or on the attached TPU (first compile is slow through the relay):
    python examples/quickstart_synthetic.py --out /tmp/quickstart
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="quickstart_out")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--skip-export", action="store_true",
                    help="skip the serving-artifact leg")
    args = ap.parse_args(argv)

    from meg_decoding_tpu.data.synthetic import make_synthetic_gwilliams_cache

    # 1. a tiny synthetic dataset in the reference's preprocessed format
    cfg = make_synthetic_gwilliams_cache(os.path.join(args.out, "cache"))
    for k, v in dict(model="brain_encoder", D1=16, D2=24, F=16, K=8,
                     d_drop=0.1, seq2seq=True, batch_size=16, updates=20,
                     epochs=args.epochs, use_sampler=True, test_size=16,
                     lr=3e-4, lr_scheduler="none", init_temperature=5.1,
                     seed=0, save_root=os.path.join(args.out, "run")).items():
        setattr(cfg, k, v)
    cfg.set_dotted("loss.kind", "clip")

    # 2. train (same dispatch as `python train.py` / meg-decode-train)
    from meg_decoding_tpu.cli.main import dispatch_train

    best = dispatch_train(cfg)
    print(f"[quickstart] best epoch: top10={best.get('test_top10'):.3f} "
          f"loss={best.get('test_loss'):.3f}")
    assert np.isfinite(best.get("train_loss", np.nan))

    # 3. evaluate the saved checkpoint (same as `python evaluate.py`)
    from meg_decoding_tpu.cli.evaluate_speech import run as evaluate

    results = evaluate(cfg)
    print(f"[quickstart] evaluate: {results}")

    if not args.skip_export:
        # 4. export a deployable serving artifact and call it
        from meg_decoding_tpu.cli.export_model import run as export

        art_dir = export(cfg)
        from meg_decoding_tpu.serving import load_artifact

        served = load_artifact(art_dir)
        rng = np.random.RandomState(0)
        C = int(cfg.num_channels)
        T = int(cfg.preprocs["brain_resample_rate"]
                * cfg.preprocs["seq_len_sec"])
        Z = np.asarray(served(rng.randn(4, C, T).astype(np.float32),
                              np.zeros(4, np.int32)))
        print(f"[quickstart] served artifact predicts {Z.shape} from raw "
              f"windows — done; everything under {args.out}")
    return best


if __name__ == "__main__":
    main()
