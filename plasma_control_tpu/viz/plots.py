"""Plotting — the reference's full figure set, regenerated from snapshots.

Capability parity with the 16 ``plot_*`` functions in
`/root/reference/src/plot.py:9-798` (same signatures modulo snake_case, same
figure layouts and PDF outputs). Field-dependent plots re-solve E from the
snapshot like the reference, but batched through the circulant operator
instead of a per-column Python loop (`plot.py:581`).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from scipy.stats import gaussian_kde  # noqa: E402

__all__ = [
    "plot_x_dist_snapshot",
    "plot_v_dist_snapshot",
    "plot_dist_snapshot",
    "plot_two_stream_snapshot",
    "plot_bump_on_tail_snapshot",
    "plot_x_dist_evolution",
    "plot_v_dist_evolution",
    "plot_dist_evolution",
    "plot_two_stream_evolution",
    "plot_bump_on_tail_evolution",
    "plot_log_e",
    "plot_e_k_spectrum",
    "plot_e_k_over_time",
    "plot_e_k_external_over_time",
    "plot_loss_curve",
    "plot_cost_over_time",
]


def _filepath(save_dir: Optional[str], filename: Optional[str]) -> Optional[str]:
    if save_dir is None:
        return None
    os.makedirs(save_dir, exist_ok=True)
    return os.path.join(save_dir, filename)


def _finish(fig, filepath):
    fig.tight_layout()
    if filepath is not None:
        fig.savefig(filepath, dpi=120)
        plt.close(fig)  # saved to disk; avoid leaking open figures
    return fig


def _e_mesh_series(snapshot: np.ndarray, length: float, n_mesh: int, n0: float = 1.0) -> np.ndarray:
    """(Nt, M) self-consistent mesh fields re-solved from the snapshot."""
    import jax.numpy as jnp

    from ..ops.deposit import deposit
    from ..ops.fields import solve_e_mesh
    from ..ops.grid import make_grid
    import jax

    n = snapshot.shape[0] // 2
    grid = make_grid(n_mesh, length)
    xs = jnp.asarray(snapshot[:n].T, dtype=jnp.float32)  # (Nt, N)
    dens = jax.vmap(lambda x: deposit(x, grid, n0=n0))(xs)
    return np.asarray(solve_e_mesh(dens, grid, n0))


# ---------------------------------------------------------------------------
# 1D marginal distributions (KDE), parity with plot.py:9-90, 224-359
# ---------------------------------------------------------------------------


def plot_x_dist_snapshot(snapshot, save_dir, filename, xmin=0.0, xmax=50.0, n_mesh=500):
    fp = _filepath(save_dir, filename)
    n = snapshot.shape[0] // 2
    xs = np.linspace(xmin, xmax, n_mesh)
    kde = gaussian_kde(np.asarray(snapshot[:n]).ravel())
    fig, ax = plt.subplots(1, 1, figsize=(6, 4), facecolor="white", dpi=120)
    ax.plot(xs, kde(xs))
    ax.set_xlabel("x")
    ax.set_ylabel(r"$f(x,\cdot)$")
    ax.set_xlim([xmin, xmax])
    return _finish(fig, fp), ax


def plot_v_dist_snapshot(snapshot, save_dir, filename, vmin=-10.0, vmax=10.0, n_mesh=500):
    fp = _filepath(save_dir, filename)
    n = snapshot.shape[0] // 2
    vs = np.linspace(vmin, vmax, n_mesh)
    kde = gaussian_kde(np.asarray(snapshot[n:]).ravel())
    fig, ax = plt.subplots(1, 1, figsize=(6, 4), facecolor="white", dpi=120)
    ax.plot(vs, kde(vs))
    ax.set_xlabel("v")
    ax.set_ylabel(r"$f(\cdot,v)$")
    ax.set_xlim([vmin, vmax])
    return _finish(fig, fp), ax


def plot_dist_snapshot(
    snapshot, save_dir, filename, xmin=0.0, xmax=50.0, vmin=-10.0, vmax=10.0, n_mesh=100
):
    """f(x, v) 2D histogram image (parity with plot.py:92-134)."""
    fp = _filepath(save_dir, filename)
    n = snapshot.shape[0] // 2
    hist, _, _ = np.histogram2d(
        np.asarray(snapshot[:n]).ravel(),
        np.asarray(snapshot[n:]).ravel(),
        bins=[n_mesh, n_mesh],
        range=[[xmin, xmax], [vmin, vmax]],
    )
    fig, ax = plt.subplots(1, 1, figsize=(5, 3), facecolor="white", dpi=120)
    ax.imshow(hist.T, extent=[xmin, xmax, vmin, vmax], aspect="auto", origin="lower")
    ax.set_xlabel("x")
    ax.set_ylabel("v")
    ax.set_title(r"$f(x,v)$")
    return _finish(fig, fp), ax


def _kde_panels(series, grid_pts, labels, xlabel, ylabel, lims):
    fig, axes = plt.subplots(1, len(series), figsize=(4 * len(series), 4), facecolor="white", dpi=120, sharey=True)
    axes = np.atleast_1d(axes).ravel()
    for ax, data, title in zip(axes, series, labels):
        kde = gaussian_kde(np.asarray(data).ravel())
        ax.plot(grid_pts, kde(grid_pts))
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.set_xlim(lims)
        ax.set_title(title)
    return fig, axes


_T_LABELS = [r"$t=0$", r"$t=t_{max}/2$", r"$t=t_{max}$"]


def plot_x_dist_evolution(snapshot, save_dir, filename, xmin=0.0, xmax=50.0, n_mesh=500):
    fp = _filepath(save_dir, filename)
    n, nt = snapshot.shape[0] // 2, snapshot.shape[1]
    xs = np.linspace(xmin, xmax, n_mesh)
    fig, axes = _kde_panels(
        [snapshot[:n, 0], snapshot[:n, nt // 2], snapshot[:n, -1]],
        xs, _T_LABELS, "x", r"$f(x,\cdot)$", [xmin, xmax],
    )
    return _finish(fig, fp), axes


def plot_v_dist_evolution(snapshot, save_dir, filename, vmin=-10.0, vmax=10.0, n_mesh=500):
    fp = _filepath(save_dir, filename)
    n, nt = snapshot.shape[0] // 2, snapshot.shape[1]
    vs = np.linspace(vmin, vmax, n_mesh)
    fig, axes = _kde_panels(
        [snapshot[n:, 0], snapshot[n:, nt // 2], snapshot[n:, -1]],
        vs, _T_LABELS, "v", r"$f(\cdot,v)$", [vmin, vmax],
    )
    return _finish(fig, fp), axes


def plot_dist_evolution(
    snapshot, save_dir, filename, xmin=0.0, xmax=50.0, vmin=-10.0, vmax=10.0, n_mesh=100
):
    fp = _filepath(save_dir, filename)
    n, nt = snapshot.shape[0] // 2, snapshot.shape[1]
    fig, axes = plt.subplots(1, 3, figsize=(12, 4), facecolor="white", dpi=120)
    axes = axes.ravel()
    for ax, idx, title in zip(axes, [0, nt // 2, nt - 1], _T_LABELS):
        hist, _, _ = np.histogram2d(
            np.asarray(snapshot[:n, idx]).ravel(),
            np.asarray(snapshot[n:, idx]).ravel(),
            bins=[n_mesh, n_mesh],
            range=[[xmin, xmax], [vmin, vmax]],
        )
        ax.imshow(hist.T, extent=[xmin, xmax, vmin, vmax], aspect="auto", origin="lower")
        ax.set_xlabel("x")
        ax.set_ylabel("v")
        ax.set_title(title)
    return _finish(fig, fp), axes


# ---------------------------------------------------------------------------
# Phase-space scatter (parity with plot.py:136-222, 421-549)
# ---------------------------------------------------------------------------


def _scatter_two_stream(ax, x_all, v_all, xmin, xmax, vmin, vmax, title):
    n = x_all.shape[0]
    nh = n // 2
    ax.scatter(x_all[:nh], v_all[:nh], s=0.3, color="blue", alpha=0.5)
    ax.scatter(x_all[nh:], v_all[nh:], s=0.3, color="red", alpha=0.5)
    ax.set_xlabel("x")
    ax.set_ylabel("v")
    ax.axis([xmin, xmax, vmin, vmax])
    ax.set_title(title)


def plot_two_stream_snapshot(snapshot, save_dir, filename, xmin=0.0, xmax=50.0, vmin=-10.0, vmax=10.0):
    fp = _filepath(save_dir, filename)
    n = snapshot.shape[0] // 2
    fig, ax = plt.subplots(1, 1, figsize=(5, 3), facecolor="white", dpi=120)
    _scatter_two_stream(ax, np.asarray(snapshot[:n]).ravel(), np.asarray(snapshot[n:]).ravel(), xmin, xmax, vmin, vmax, "Phase space")
    return _finish(fig, fp), ax


def plot_two_stream_evolution(snapshot, save_dir, filename, xmin=0.0, xmax=50.0, vmin=-10.0, vmax=10.0):
    fp = _filepath(save_dir, filename)
    n, nt = snapshot.shape[0] // 2, snapshot.shape[1]
    fig, axes = plt.subplots(1, 3, figsize=(12, 4), facecolor="white", dpi=120)
    axes = axes.ravel()
    for ax, idx, title in zip(axes, [0, nt // 2, nt - 1], _T_LABELS):
        _scatter_two_stream(ax, np.asarray(snapshot[:n, idx]), np.asarray(snapshot[n:, idx]), xmin, xmax, vmin, vmax, title)
    return _finish(fig, fp), axes


def _scatter_bump(ax, x_all, v_all, high_idx, xmin, xmax, vmin, vmax, title):
    n = x_all.shape[0]
    if high_idx is not None:
        mask = np.zeros(n, dtype=bool)
        mask[np.asarray(high_idx)] = True
    else:
        mask = np.zeros(n, dtype=bool)
    ax.scatter(x_all[~mask], v_all[~mask], s=0.3, color="blue", alpha=0.5)
    if high_idx is not None:
        ax.scatter(x_all[mask], v_all[mask], s=0.3, color="red", alpha=0.5)
    ax.set_xlabel("x")
    ax.set_ylabel("v")
    ax.axis([xmin, xmax, vmin, vmax])
    ax.set_title(title)


def plot_bump_on_tail_snapshot(
    snapshot, save_dir, filename, xmin=0.0, xmax=50.0, vmin=-10.0, vmax=10.0, high_electron_indice=None
):
    fp = _filepath(save_dir, filename)
    n = snapshot.shape[0] // 2
    fig, ax = plt.subplots(1, 1, figsize=(5, 3), facecolor="white", dpi=120)
    _scatter_bump(ax, np.asarray(snapshot[:n]).ravel(), np.asarray(snapshot[n:]).ravel(), high_electron_indice, xmin, xmax, vmin, vmax, "Phase space")
    return _finish(fig, fp), ax


def plot_bump_on_tail_evolution(
    snapshot, save_dir, filename, xmin=0.0, xmax=50.0, vmin=-10.0, vmax=10.0, high_electron_indice=None
):
    fp = _filepath(save_dir, filename)
    n, nt = snapshot.shape[0] // 2, snapshot.shape[1]
    fig, axes = plt.subplots(1, 3, figsize=(12, 4), facecolor="white", dpi=120)
    axes = axes.ravel()
    for ax, idx, title in zip(axes, [0, nt // 2, nt - 1], _T_LABELS):
        _scatter_bump(ax, np.asarray(snapshot[:n, idx]), np.asarray(snapshot[n:, idx]), high_electron_indice, xmin, xmax, vmin, vmax, title)
    return _finish(fig, fp), axes


# ---------------------------------------------------------------------------
# Field energy / spectrum (parity with plot.py:551-728)
# ---------------------------------------------------------------------------


def plot_log_e(tmax, length, dx, n_mesh, snapshot, save_dir, filename):
    fp = _filepath(save_dir, filename)
    nt = snapshot.shape[1]
    ts = np.linspace(0, tmax, nt)
    e_mesh = _e_mesh_series(np.asarray(snapshot), length, int(n_mesh))
    e2 = np.mean(e_mesh**2, axis=1)
    fig, ax = plt.subplots(1, 1, figsize=(5, 3), facecolor="white", dpi=120)
    ax.plot(ts, e2)
    ax.set_xlabel("Timestep")
    ax.set_ylabel(r"$\log <E^2>$")
    ax.set_yscale("log")
    return _finish(fig, fp), ax


def _spectrum(snapshot, length, dx, n_mesh):
    from ..diag.spectrum import spectrum_wavenumbers

    e_mesh = _e_mesh_series(np.asarray(snapshot), length, int(n_mesh))  # (Nt, M)
    ek = np.abs(np.fft.fft(e_mesh, axis=1) / n_mesh * 2.0)
    ks = spectrum_wavenumbers(int(n_mesh), dx)
    return ks, ek[:, : len(ks)].T  # (n_keep, Nt)


def plot_e_k_spectrum(tmax, length, dx, n_mesh, snapshot, save_dir, filename):
    fp = _filepath(save_dir, filename)
    ks, spec = _spectrum(snapshot, length, dx, n_mesh)
    fig, ax = plt.subplots(1, 1, figsize=(6, 3), facecolor="white", dpi=120)
    ax.imshow(spec, extent=[0, tmax, ks[0], ks[-1]], aspect="auto", origin="lower")
    ax.set_xlabel(r"$t$")
    ax.set_ylabel(r"$k$")
    ax.set_title(r"$E_k$")
    ax.set_ylim([0, 1.0])
    ax.grid(True)
    return _finish(fig, fp), ax


def plot_e_k_over_time(tmax, length, dx, n_mesh, max_mode, snapshot, save_dir, filename):
    fp = _filepath(save_dir, filename)
    nt = snapshot.shape[1]
    ts = np.linspace(0, tmax, nt)
    _, spec = _spectrum(snapshot, length, dx, n_mesh)
    fig, ax = plt.subplots(1, 1, figsize=(6, 3), facecolor="white", dpi=120)
    for i in range(1, max_mode + 1):
        ax.plot(ts, spec[i, :].ravel(), label=rf"$n={i}$")
    ax.set_xlabel(r"$t$")
    ax.set_ylabel(r"$E_k$")
    ax.legend()
    ax.grid(True)
    return _finish(fig, fp), ax


def plot_e_k_external_over_time(tmax, coeff_cos, coeff_sin, save_dir, filename):
    """Mode amplitudes sqrt(a^2+b^2)(t); coeffs are (K, Nt) like the
    reference's stacked actuator history (plot.py:687-728)."""
    fp = _filepath(save_dir, filename)
    coeff_cos = np.asarray(coeff_cos)
    coeff_sin = np.asarray(coeff_sin)
    max_mode, nt = coeff_cos.shape
    amp = np.sqrt(coeff_cos**2 + coeff_sin**2)
    ts = np.linspace(0, tmax, nt)
    fig, ax = plt.subplots(1, 1, figsize=(6, 3), facecolor="white", dpi=120)
    for i in range(max_mode):
        ax.plot(ts, amp[i, :].ravel(), label=rf"$n={i + 1}$")
    ax.set_xlabel(r"$t$")
    ax.set_ylabel(r"$E_k$")
    ax.legend()
    ax.grid(True)
    return _finish(fig, fp), ax


# ---------------------------------------------------------------------------
# Training curves / cost traces (parity with plot.py:730-798)
# ---------------------------------------------------------------------------


def plot_loss_curve(info: Dict, save_dir, filename):
    fp = _filepath(save_dir, filename)
    fig, ax = plt.subplots(1, 1, figsize=(5, 3), facecolor="white", dpi=120)
    for name, value in info.items():
        ax.plot(np.asarray(value), label=f"{name}")
    ax.set_xlabel("Episode")
    ax.set_ylabel("Loss")
    ax.legend()
    ax.grid(True)
    return _finish(fig, fp), ax


def plot_cost_over_time(tmax, nt, mdict: Dict, save_dir, filename):
    fp = _filepath(save_dir, filename)
    ts = np.linspace(0, tmax, nt)
    fig, ax = plt.subplots(1, 1, figsize=(6, 3), facecolor="white", dpi=120)
    for key, value in mdict.items():
        ax.plot(ts, np.asarray(value), label=f"{key}")
    ax.set_xlabel(r"$t$")
    ax.set_ylabel("Cost")
    ax.set_yscale("log")
    ax.legend()
    ax.grid(True)
    return _finish(fig, fp), ax
