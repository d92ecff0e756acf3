"""Post-hoc controlled-vs-uncontrolled comparison.

The script form of the reference's analysis notebooks
(`/root/reference/analysis/optimal_control_{two_stream,bump_on_tail}.ipynb`):
loads two run dumps (uncontrolled and controlled; .mat or .npz), computes the
Landau damping/growth rate of each via the log E^2 regression, and plots the
field-energy and cost comparisons.

Usage:
  python analysis/compare_control.py --simcase bump-on-tail \
      --uncontrolled dataset/bump-on-tail/wo-oc/data.npz \
      --controlled dataset/bump-on-tail/mpc-control/data.npz \
      --out result/bump-on-tail
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--simcase", default="bump-on-tail")
    p.add_argument("--uncontrolled", required=True)
    p.add_argument("--controlled", required=True)
    p.add_argument("--out", default="result/analysis")
    p.add_argument("--cpu", action="store_true", help="run the (cheap) analysis math on CPU")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from plasma_control_tpu.diag.landau import compute_linear_damping_rate
    from plasma_control_tpu.io.export import load_run
    from plasma_control_tpu.ops.deposit import deposit
    from plasma_control_tpu.ops.fields import solve_e_mesh
    from plasma_control_tpu.ops.grid import make_grid

    os.makedirs(args.out, exist_ok=True)

    run_wo = load_run(args.uncontrolled)
    run_oc = load_run(args.controlled)

    length = float(np.ravel(run_wo["L"])[0])
    n_mesh = int(np.ravel(run_wo["N_mesh"])[0])
    tmax = float(np.ravel(run_wo["tmax"])[0])
    grid = make_grid(n_mesh, length)

    def e2_series(snapshot):
        n = snapshot.shape[0] // 2
        xs = jnp.asarray(snapshot[:n].T, dtype=jnp.float32)
        dens = jax.vmap(lambda x: deposit(x, grid))(xs)
        e = solve_e_mesh(dens, grid)
        return np.asarray(jnp.mean(e**2, axis=-1))

    snap_wo = np.asarray(run_wo["snapshot"])
    snap_oc = np.asarray(run_oc["snapshot"])

    gamma_wo = float(compute_linear_damping_rate(tmax, 1.0, grid, jnp.asarray(snap_wo, dtype=jnp.float32), n_mesh))
    gamma_oc = float(compute_linear_damping_rate(tmax, 1.0, grid, jnp.asarray(snap_oc, dtype=jnp.float32), n_mesh))
    print(f"Landau damping rate without control: {gamma_wo:.5f}")
    print(f"Landau damping rate optimal control: {gamma_oc:.5f}")

    ts = np.linspace(0, tmax, snap_wo.shape[1])
    fig, ax = plt.subplots(1, 1, figsize=(6, 4), facecolor="white", dpi=120)
    ax.plot(ts, e2_series(snap_wo), label="Original")
    ax.plot(np.linspace(0, tmax, snap_oc.shape[1]), e2_series(snap_oc), label="Control")
    ax.set_xlabel("Timestep")
    ax.set_ylabel(r"$\log <E^2>$")
    ax.set_yscale("log")
    ax.grid(True)
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "log_E_compare.pdf"), dpi=120)

    if "cost" in run_wo and "cost" in run_oc:
        def cost_arr(run, key):
            c = run["cost"]
            if isinstance(c, dict):
                return np.ravel(c[key]) if key in c else None
            return None

        fig, ax = plt.subplots(1, 1, figsize=(6, 4), facecolor="white", dpi=120)
        for run, name in [(run_wo, "original"), (run_oc, "control")]:
            for key in (r"$J_{ee}$", r"$J_{ie}$"):
                arr = cost_arr(run, key)
                if arr is not None:
                    ax.plot(np.linspace(0, tmax, len(arr)), arr, label=f"{key} {name}")
        ax.set_xlabel(r"$t$")
        ax.set_ylabel("Cost")
        ax.set_yscale("log")
        ax.grid(True)
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "cost_compare.pdf"), dpi=120)

    print(f"# analysis artifacts in {args.out}")


if __name__ == "__main__":
    main()
