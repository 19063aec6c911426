"""Reference-compatible entry point: eval_wowandb_cv.py.

GOD retrieval evaluation + error analysis (confusion matrix, FP/TP rates,
std-vs-TP scatter, top5.csv) — reference eval_wowandb_cv.py:280-406.
"""

import sys

from meg_decoding_tpu.cli.evaluate_god import run
from meg_decoding_tpu.cli.main import parse_cli

if __name__ == "__main__":
    sys.argv[1:1] = ["error_analysis=true"]
    run(parse_cli(default_config_name="config_GOD"))
