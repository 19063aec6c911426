"""Rest-period mean/std sanity check for GOD sessions.

Reference: ``examples/rest.py:6-29`` — loads each subject's rest .mat and
prints the per-channel baseline statistics used for z-scoring.

    python examples/rest.py --config-name config_GOD
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meg_decoding_tpu.cli.main import parse_cli
from meg_decoding_tpu.data.god import get_baseline


def main():
    cfg = parse_cli(default_config_name="config_GOD")
    for sub in cfg.subjects.keys():
        scfg = cfg.subjects[sub]
        fs = float(scfg["fs"])
        for rest_name in scfg["train"]["rest"]:
            path = f"{cfg.data_root}/{sub}/mat/{rest_name}"
            mean, std = get_baseline(path, fs, cfg.rest_duration)
            print(f"{sub}/{rest_name}: mean |μ|={np.abs(mean).mean():.3e} "
                  f"mean σ={std.mean():.3e} (min σ={std.min():.3e})")


if __name__ == "__main__":
    main()
