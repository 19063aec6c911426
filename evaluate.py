"""Evaluation entry point (reference-compatible name, Hydra-style config).

Reference: ``evaluate.py`` (GOD zero-shot classification + pairwise
identification); speech datasets get a standalone checkpoint evaluator the
reference lacks (it only scores in-loop).  Usage:

    python evaluate.py --config-name config_GOD save_root=runs_out
    python evaluate.py dataset=Gwilliams2022 save_root=runs_out
"""

import sys


if __name__ == "__main__":
    # same dispatch as the packaged `meg-decode-evaluate` console script
    from meg_decoding_tpu.cli.main import evaluate_main

    evaluate_main(sys.argv[1:])
