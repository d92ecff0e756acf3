"""Extract a compact golden trace from a reference DDPG evaluation run.

The reference's own torch DDPG (`/root/reference/run_ddpg.py --optimize`)
was run on CPU (numba shimmed to pure NumPy — identical float64 semantics,
just un-jitted) to produce `dataset/<case>/ddpg-control/data.mat`. This
script distills it to the pieces the golden replay test needs
(tests/test_golden.py::TestReferenceDDPGGolden):

* the post-step-0 particle state (snapshot column 0) as the replay start,
* the applied coefficient sequence (the DDPG policy's actions),
* the reference's recorded PE(t),
* the exact workload scalars.

Saved to tests/data/ddpg_golden_<case>.npz (force-added to git — *.npz is
otherwise ignored). Eval alignment (`run_ddpg.py:276-313`): snapshot column
t and PE[t] are AFTER step t; coeff column t is the action applied DURING
step t — so a replay from column 0 applies coeff columns 1..T-1 and
compares PE[1:].

Usage: python experiments/make_ddpg_golden.py <data.mat> <simcase> [tag]

``tag`` overrides the output basename (default: simcase with dashes as
underscores) — used for the PPO golden (tag "two_stream_ppo"), whose replay
test reads the simcase from inside the npz.
"""

import os
import sys

import numpy as np
import scipy.io as sio

if __name__ == "__main__":
    mat_path, simcase = sys.argv[1], sys.argv[2]
    d = sio.loadmat(mat_path)
    n = int(d["N"][0, 0])
    snap0 = d["snapshot"][:, 0]
    out = dict(
        x0=snap0[:n].astype(np.float64),
        v0=snap0[n:].astype(np.float64),
        coeff_cos=d["coeff_cos"].astype(np.float64),  # (K, Nt)
        coeff_sin=d["coeff_sin"].astype(np.float64),
        pe=np.ravel(d["PE"]).astype(np.float64),  # (Nt,) post-step energies
        n_particles=n,
        n_mesh=int(d["N_mesh"][0, 0]),
        length=float(d["L"][0, 0]),
        dt=float(d["dt"][0, 0]),
        n0=float(d["n0"][0, 0]),
        simcase=simcase,
    )
    tag = sys.argv[3] if len(sys.argv) > 3 else simcase.replace("-", "_")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "tests", "data", f"ddpg_golden_{tag}.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes")
