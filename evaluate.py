"""Evaluation entry point (reference-compatible name, Hydra-style config).

Reference: ``evaluate.py`` (GOD zero-shot classification + pairwise
identification); speech datasets get a standalone checkpoint evaluator the
reference lacks (it only scores in-loop).  Usage:

    python evaluate.py --config-name config_GOD save_root=runs_out
    python evaluate.py dataset=Gwilliams2022 save_root=runs_out
"""

import sys

from meg_decoding_tpu.cli.main import parse_cli

if __name__ == "__main__":
    # a bare `dataset=Gwilliams2022` override must compose the speech config,
    # not config_GOD (which lacks the speech preproc keys)
    overrides = dict(a.split("=", 1) for a in sys.argv[1:]
                     if "=" in a and not a.startswith("--"))
    speech = overrides.get("dataset") in ("Gwilliams2022", "Brennan2018")
    cfg = parse_cli(default_config_name="config" if speech else "config_GOD")
    if cfg.dataset in ("Gwilliams2022", "Brennan2018"):
        from meg_decoding_tpu.cli.evaluate_speech import run
    else:
        from meg_decoding_tpu.cli.evaluate_god import run
    run(cfg)
