"""Physics integration tests (SURVEY §4 level 2): instability growth,
energy conservation, damping-rate diagnostics, trajectory parity vs oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plasma_control_tpu.config import SimConfig
from plasma_control_tpu.models.pic import PIC, PlasmaState, init_state, step
from plasma_control_tpu.models.rollout import rollout, snapshot_from_rollout
from plasma_control_tpu.ops.grid import make_grid
from plasma_control_tpu.diag.landau import damping_rate_from_field_energy

import oracle


def small_cfg(**kw):
    base = dict(n_particles=2000, n_mesh=64, dt=0.1, t_max=15.0, length=50.0)
    base.update(kw)
    return SimConfig(**base)


class TestRollout:
    def test_multistep_matches_oracle(self, rng):
        """10 full steps agree with the float64 oracle before chaos amplifies
        rounding differences."""
        cfg = small_cfg()
        grid = make_grid(cfg.n_mesh, cfg.length)
        x64 = rng.uniform(0, cfg.length, cfg.n_particles)
        v64 = rng.standard_normal(cfg.n_particles)

        st = PlasmaState(jnp.asarray(x64, dtype=jnp.float32), jnp.asarray(v64, dtype=jnp.float32))
        out = rollout(st, grid, cfg, n_steps=10, record_snapshots=True)

        x, v = x64.copy(), v64.copy()
        for _ in range(10):
            x, v = oracle.yoshida4_step(x, v, cfg.length, cfg.n_mesh, cfg.n0, cfg.clamped_dt())
        # positions modulo wrap: compare circular distance
        dx = np.abs(np.asarray(out.final_state.x) - x)
        dx = np.minimum(dx, cfg.length - dx)
        assert np.percentile(dx, 99) < 5e-2
        assert np.percentile(np.abs(np.asarray(out.final_state.v) - v), 99) < 5e-2

    def test_rollout_shapes(self):
        cfg = small_cfg(t_max=2.0)
        grid = make_grid(cfg.n_mesh, cfg.length)
        st = init_state(cfg, jax.random.PRNGKey(0))
        out = rollout(st, grid, cfg, record_snapshots=True)
        t = cfg.n_steps
        assert out.field_energy.shape == (t + 1,)
        assert out.xs.shape == (t + 1, cfg.n_particles)
        snap = snapshot_from_rollout(out)
        assert snap.shape == (2 * cfg.n_particles, t + 1)

    def test_pic_class_api(self):
        """The stateful wrapper mirrors the reference class surface."""
        cfg = small_cfg(t_max=1.0)
        sim = PIC(cfg)
        e0 = float(sim.get_energy())
        sim.update_state(None)
        sim.update_state(jnp.zeros(cfg.n_mesh))
        sim.update_state_w_input_func(lambda x: jnp.zeros(cfg.n_mesh))
        assert sim.get_state().shape == (2 * cfg.n_particles,)
        snap, h, pe = sim.simulate(None)
        assert snap.shape == (2 * cfg.n_particles, cfg.n_steps + 1)
        assert np.isfinite(np.asarray(h)).all()
        assert abs(float(h[0]) - e0) / abs(e0) < 0.2  # state advanced, same scale


class TestTwoStreamInstability:
    def test_field_energy_grows(self):
        """The two-stream instability must amplify field energy by orders of
        magnitude before saturation (reference verification: plot_log_E,
        `/root/reference/src/plot.py:551-595`)."""
        cfg = small_cfg(simcase="two-stream", t_max=20.0)
        grid = make_grid(cfg.n_mesh, cfg.length)
        st = init_state(cfg, jax.random.PRNGKey(42))
        out = rollout(st, grid, cfg)
        pe = np.asarray(out.field_energy)
        assert np.isfinite(pe).all()
        growth = pe[100:160].mean() / pe[:5].mean()
        assert growth > 30.0, f"growth factor {growth}"

    def test_growth_rate_positive(self):
        cfg = small_cfg(simcase="two-stream", t_max=15.0)
        grid = make_grid(cfg.n_mesh, cfg.length)
        st = init_state(cfg, jax.random.PRNGKey(7))
        out = rollout(st, grid, cfg)
        ts = jnp.linspace(0.0, cfg.t_max, cfg.n_steps + 1)
        gamma = float(damping_rate_from_field_energy(ts, out.field_energy))
        assert gamma > 0.05, f"two-stream growth rate {gamma}"


class TestEnergyConservation:
    def test_hamiltonian_drift_bounded(self):
        """Symplectic integration: relative H drift stays small over the
        linear phase of the run."""
        cfg = small_cfg(t_max=10.0, n_particles=4000)
        grid = make_grid(cfg.n_mesh, cfg.length)
        st = init_state(cfg, jax.random.PRNGKey(3))
        out = rollout(st, grid, cfg)
        h = np.asarray(out.hamiltonian)
        drift = np.abs(h - h[0]).max() / abs(h[0])
        assert drift < 0.05, f"relative energy drift {drift}"


class TestDistributions:
    def test_two_stream_moments(self):
        from plasma_control_tpu.models.distributions import TwoStream

        d = TwoStream(v0=3.0, sigma=1.0, n_samples=200_000, length=50.0)
        x, v = d.sample(jax.random.PRNGKey(0))
        v = np.asarray(v)
        x = np.asarray(x)
        assert 0 <= x.min() and x.max() <= 50.0
        n_half = len(v) // 2
        assert abs(v[:n_half].mean() - 3.0) < 0.02
        assert abs(v[n_half:].mean() + 3.0) < 0.02
        assert abs(v[:n_half].std() - 1.0) < 0.02

    def test_bump_on_tail_moments(self):
        from plasma_control_tpu.models.distributions import BumpOnTail

        d = BumpOnTail(a=0.2, v0=4.0, sigma=0.5, n_samples=120_000, length=50.0)
        x, v = d.sample(jax.random.PRNGKey(1))
        v = np.asarray(v)
        n1 = d.n_background
        assert n1 == int(120_000 / 1.2)
        assert abs(v[:n1].mean()) < 0.02
        assert abs(v[n1:].mean() - 4.0) < 0.02
        hi = np.asarray(d.high_indices())
        assert hi[0] == n1 and hi[-1] == 120_000 - 1

    def test_perturbation_applied(self):
        from plasma_control_tpu.models.distributions import sample_initial_state

        cfg = small_cfg(perturb_amplitude=0.5, perturb_mode=1)
        x, v = sample_initial_state(cfg, jax.random.PRNGKey(0))
        # With A=0.5 the velocity field is strongly modulated along x:
        x = np.asarray(x)
        v = np.asarray(v)
        mod = np.sin(2 * np.pi * x / cfg.length)
        # correlation between |v| modulation and sin(x) should be strong
        c = np.corrcoef(np.abs(v), np.abs(1 + 0.5 * mod))[0, 1]
        assert c > 0.1


class TestLandauDamping:
    def test_maxwellian_perturbation_damps(self):
        """A Maxwellian (two-stream with v0=0) with a seeded perturbation
        exhibits Landau damping: negative log-E^2 slope, in contrast to the
        two-stream growth test above."""
        cfg = small_cfg(simcase="two-stream", vb=0.0, vth=1.0, t_max=10.0,
                        perturb_amplitude=0.3, perturb_mode=1, n_particles=20000)
        grid = make_grid(cfg.n_mesh, cfg.length)
        st = init_state(cfg, jax.random.PRNGKey(11))
        out = rollout(st, grid, cfg)
        ts = jnp.linspace(0.0, cfg.t_max, cfg.n_steps + 1)
        gamma = float(damping_rate_from_field_energy(ts, out.field_energy))
        assert gamma < 0.0, f"expected Landau damping, got gamma={gamma}"


class TestLandauCase:
    """The new `landau` simcase (Maxwellian + density perturbation —
    models/distributions.py::Maxwellian): sampling correctness and a
    quantitative validation of the measured damping rate against the
    analytic kinetic rate in simulation units
    (diag/landau.py::landau_damping_rate_analytic_sim)."""

    def test_maxwellian_sampling(self):
        from plasma_control_tpu.models.distributions import Maxwellian

        d = Maxwellian(vth=1.2, amplitude=0.3, mode=2, n_samples=200_000, length=50.0)
        x, v = d.sample(jax.random.PRNGKey(0))
        x, v = np.asarray(x), np.asarray(v)
        assert ((x >= 0) & (x < 50.0)).all()
        # x-density follows 1 + A cos(kx)
        hist, edges = np.histogram(x, bins=50, range=(0, 50.0))
        centers = 0.5 * (edges[1:] + edges[:-1])
        expected = (1.0 + 0.3 * np.cos(2 * np.pi * 2 * centers / 50.0)) * len(x) / 50.0
        np.testing.assert_allclose(hist, expected, rtol=0.06)
        # thermal velocities, no drift
        assert abs(np.mean(v)) < 0.02
        np.testing.assert_allclose(np.std(v), 1.2, rtol=0.02)

    def test_landau_damping_rate_matches_analytic(self):
        """Mode-resolved log|E_k|^2 slope over t in [1, 9] matches the
        analytic Landau rate at k lambda_D = 0.5 (the classic kinetic
        benchmark, gamma = -0.153) — 3-seed mean within 35% (measured
        -0.163 on the dev run; per-seed spread ~25% at N=20k)."""
        from plasma_control_tpu.config import SimConfig
        from plasma_control_tpu.diag.landau import (
            damping_rate_from_field_energy,
            landau_damping_rate_analytic_sim,
        )
        from plasma_control_tpu.models.pic import init_state
        from plasma_control_tpu.models.rollout import rollout
        from plasma_control_tpu.ops.deposit import deposit
        from plasma_control_tpu.ops.fields import solve_e_mesh
        from plasma_control_tpu.ops.grid import make_grid

        cfg = SimConfig(simcase="landau", n_particles=20000, n_mesh=64, dt=0.1,
                        t_max=12.0, length=50.0, vth=1.0,
                        perturb_amplitude=0.2, perturb_mode=4)
        grid = make_grid(cfg.n_mesh, cfg.length)
        k = 2 * np.pi * cfg.perturb_mode / cfg.length
        g_th = landau_damping_rate_analytic_sim(k, cfg.vth, cfg.n0)

        fits = []
        for seed in range(3):
            st = init_state(cfg, jax.random.PRNGKey(seed))
            out = rollout(st, grid, cfg, record_snapshots=True)
            dens = jax.vmap(lambda x: deposit(x, grid, n0=cfg.n0))(out.xs)
            e = solve_e_mesh(dens, grid, cfg.n0)
            e2 = jnp.abs(jnp.fft.rfft(e, axis=-1)[:, cfg.perturb_mode]) ** 2
            ts = jnp.linspace(0.0, cfg.t_max, e2.shape[0])
            w = (ts >= 1.0) & (ts <= 9.0)
            fits.append(float(damping_rate_from_field_energy(ts[w], e2[w])))

        assert all(g < 0 for g in fits)  # every seed damps
        mean_fit = float(np.mean(fits))
        assert abs(mean_fit - g_th) / abs(g_th) < 0.35, (fits, g_th)
