"""One-off converters: Brainstorm channel files → montage.csv / ch_region.json.

Reference: ``meg_decoding/matlab_utils/utils.py:8-44`` — extracts per-channel
3-D locations and region groupings from a Brainstorm channel .mat into the
``data/GOD/montage.csv`` and ``data/GOD/ch_region.json`` files the loaders
consume.

    python scripts/convert_brainstorm_montage.py channel.mat out_dir/
"""

import json
import os
import sys

import numpy as np
import scipy.io


def convert(channel_mat: str, out_dir: str, num_channels: int = 203):
    data = scipy.io.loadmat(channel_mat)
    chans = data["Channel"][0]

    locs, regions = [], {}
    for i, ch in enumerate(chans[:num_channels]):
        # Brainstorm: Loc is (3, n_coils); take the mean location
        loc = np.asarray(ch["Loc"], dtype=float)
        locs.append(loc.mean(axis=1) if loc.ndim == 2 else loc.reshape(3))
        comment = str(np.squeeze(ch["Comment"])) if "Comment" in ch.dtype.names else ""
        # region grouping from the comment field, e.g. "Occipital Left"
        parts = comment.lower().split()
        if len(parts) >= 2:
            region, side = parts[0], parts[1]
            regions.setdefault(region, {}).setdefault(side, []).append(i + 1)

    os.makedirs(out_dir, exist_ok=True)
    montage_path = os.path.join(out_dir, "montage.csv")
    np.savetxt(montage_path, np.asarray(locs), delimiter=",")
    region_path = os.path.join(out_dir, "ch_region.json")
    with open(region_path, "w") as f:
        json.dump(regions, f, indent=2)
    print(f"wrote {montage_path} ({len(locs)} channels) and {region_path} "
          f"({sum(len(s) for r in regions.values() for s in r.values())} "
          "region-assigned channels)")
    return montage_path, region_path


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
