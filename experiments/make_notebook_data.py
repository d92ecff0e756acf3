"""Distill full run dumps into compact committed datasets for the analysis
notebooks (VERDICT r1 next-round #8).

The reference's notebooks (`/root/reference/analysis/optimal_control_*.ipynb`)
load `dataset/**/data.mat` files that are git-ignored and never committed, so
its analysis is not reproducible-from-repo. Ours is: this script decimates a
run dump's snapshot in time (default x5) and casts it to float32, keeping the
scalar series (PE, costs, coefficients) at full rate, producing a ~4 MB npz
per run that IS committed (`analysis/data/<case>/<run>/data.npz`, force-added
past the *.npz ignore). The damping-rate regression and log<E^2> plots are
insensitive to snapshot-time decimation (they fit/draw ~100 points anyway).

Usage: python experiments/make_notebook_data.py <data.npz> <case> <runname> [stride]
"""

import os
import sys

import numpy as np

if __name__ == "__main__":
    src, case, runname = sys.argv[1], sys.argv[2], sys.argv[3]
    stride = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    d = np.load(src, allow_pickle=False)
    out = {}
    for k in d.files:
        a = d[k]
        if k == "snapshot":
            out[k] = a[:, ::stride].astype(np.float32)
        else:
            out[k] = a
    out["snapshot_stride"] = np.int64(stride)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(root, "analysis", "data", case, runname, "data.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **out)
    print("wrote", dst, f"{os.path.getsize(dst)/1e6:.1f} MB")
