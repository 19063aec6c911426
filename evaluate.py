"""Evaluation entry point (reference-compatible name, Hydra-style config).

Reference: ``evaluate.py`` (GOD zero-shot classification + pairwise
identification).  Usage:

    python evaluate.py --config-name config_GOD save_root=runs_out
"""

from meg_decoding_tpu.cli.evaluate_god import run
from meg_decoding_tpu.cli.main import parse_cli

if __name__ == "__main__":
    run(parse_cli(default_config_name="config_GOD"))
