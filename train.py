"""Training entry point (reference-compatible name and Hydra-style config).

Reference: ``train.py`` (Gwilliams2022/Brennan2018 contrastive) and the
``train_wowandb*`` GOD family — one dispatcher here, selected by
``dataset:`` in the config (``configs/config.yaml`` /
``configs/config_GOD.yaml``, drop-in compatible keys).

    python train.py --config-name config_GOD dataset=GOD epochs=10
    python train.py dataset=GOD epochs=10   # composes config_GOD automatically
"""

import sys



def run(cfg):
    """Programmatic form of the reference's ``run(args)`` (train.py:28):
    train on an already-composed config.  One implementation, shared with
    the ``meg-decode-train`` console script."""
    from meg_decoding_tpu.cli.main import dispatch_train

    return dispatch_train(cfg)


if __name__ == "__main__":
    # same dispatch as the packaged `meg-decode-train` console script
    from meg_decoding_tpu.cli.main import train_main

    train_main(sys.argv[1:])
