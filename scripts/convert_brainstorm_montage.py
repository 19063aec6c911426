"""One-off converters: Brainstorm channel files → montage.csv / ch_region.json.

Reference: ``meg_decoding/matlab_utils/utils.py:8-44`` — extracts per-channel
3-D locations and region groupings from a Brainstorm channel .mat into the
``data/GOD/montage.csv`` and ``data/GOD/ch_region.json`` files the loaders
consume.

    python scripts/convert_brainstorm_montage.py channel.mat out_dir/
    python scripts/convert_brainstorm_montage.py --region region.mat ch_region.json
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


def convert_region_mat(region_mat: str, savefile: str,
                       expected_total: int | None = None):
    """Dedicated region .mat → ch_region.json (reference
    ``matlab_utils/utils.py:25-44`` ``create_ch_region_pair``): top-level
    keys are regions, each a MATLAB struct whose FIELD NAMES are the
    subregions and whose values list 1-indexed channel ids.  ``convert``
    above derives regions from the channel file's Comment field instead;
    this handles the reference's separate region file schema."""
    data = scipy.io.loadmat(region_mat)
    region_ch, all_ch = {}, []
    for k in data.keys():
        if "__" in k:
            continue
        region_ch[k] = {}
        rec = data[k][0]
        for i, sub_region in enumerate(rec.dtype.names):
            ch = [int(c) for c in np.asarray(rec[0][i]).reshape(-1)
                  .astype(np.int64)]
            region_ch[k][sub_region] = ch
            all_ch += ch
    assert len(all_ch) == len(np.unique(all_ch)), "channel listed twice"
    if expected_total is not None:
        assert len(all_ch) == expected_total, (len(all_ch), expected_total)
    with open(savefile, "w") as f:
        json.dump(region_ch, f, indent=4)
    print(f"wrote {savefile} ({len(all_ch)} region-assigned channels)")
    return region_ch


if __name__ == "__main__":
    # --region <region.mat> <out.json> | <channel.mat> <out_dir>
    if "--region" in sys.argv:
        argv = [a for a in sys.argv[1:] if a != "--region"]
        convert_region_mat(argv[0], argv[1])
    else:
        convert(sys.argv[1], sys.argv[2])
