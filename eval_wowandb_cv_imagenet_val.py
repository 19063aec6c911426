"""Reference-compatible entry point: eval_wowandb_cv_imagenet_val.py.

Same analysis scored against a gallery extended with 50k ImageNet-val CLIP
distractors (reference eval_wowandb_cv_imagenet_val.py:149-160,366-391).
Point ``imagenet_val_features_path`` at the distractor .npy.
"""

import sys

from meg_decoding_tpu.cli.evaluate_god import run
from meg_decoding_tpu.cli.main import parse_cli

if __name__ == "__main__":
    sys.argv[1:1] = ["error_analysis=true"]
    cfg = parse_cli(default_config_name="config_GOD")
    assert cfg.get("imagenet_val_features_path"), \
        "set imagenet_val_features_path=<50k CLIP features .npy>"
    run(cfg)
