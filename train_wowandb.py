"""Reference-compatible entry point: train_wowandb.py.

Thin wrapper over the unified GOD trainer with this variant's loss/split
defaults pre-applied (see SURVEY §2.9 for the reference script's delta).
CLI overrides still win: ``python train_wowandb.py epochs=10``.
"""

import sys

from meg_decoding_tpu.cli.main import parse_cli
from meg_decoding_tpu.cli.train_god import run

if __name__ == "__main__":
    sys.argv[1:1] = ['training_mode=split']
    best = run(parse_cli(default_config_name="config_GOD"))
    print("best:", best)
