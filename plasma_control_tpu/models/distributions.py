"""Initial phase-space distributions: two-stream and bump-on-tail.

Capability parity with `/root/reference/src/env/dist.py:27-195` (``TwoStream``,
``BumpOnTail``) re-designed for JAX:

* The reference rejection-samples in Python while-loops with NumPy's global
  seed (`dist.py:70-102`); here we sample the *same target distributions*
  directly with ``jax.random`` via inverse-CDF truncated normals — exact,
  loop-free, jit/vmap-friendly, explicit keys.
* The reference's rejection target is a Gaussian restricted to the proposal
  window v in [-10, 10] with uniform acceptance, i.e. exactly a truncated
  normal — so direct truncated-normal sampling is distributionally identical
  (not bit-identical: RNG parity is impossible across NumPy legacy and
  Threefry; see SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig

__all__ = ["TwoStream", "BumpOnTail", "Maxwellian", "make_distribution", "sample_initial_state"]

V_WINDOW = 10.0  # proposal window [-10, 10] (`/root/reference/src/env/dist.py:77`)


def _truncated_normal(key, n, mean, sigma, lo, hi, dtype=jnp.float32):
    """Inverse-CDF sampling of N(mean, sigma^2) truncated to [lo, hi]."""
    a = (lo - mean) / sigma
    b = (hi - mean) / sigma
    u = jax.random.uniform(key, (n,), dtype=jnp.float32)
    fa = jax.scipy.stats.norm.cdf(a)
    fb = jax.scipy.stats.norm.cdf(b)
    z = jax.scipy.special.ndtri(fa + u * (fb - fa))
    return (mean + sigma * jnp.clip(z, a, b)).astype(dtype)


@dataclasses.dataclass(frozen=True)
class TwoStream:
    """Two counter-streaming beams at +/- v0 (`/root/reference/src/env/dist.py:27-102`).

    First half of the particles belongs to the +v0 beam, second half to the
    -v0 beam, mirroring the reference's fill order (`dist.py:78-97`).
    """

    v0: float = 4.0
    sigma: float = 0.5
    n_samples: int = 40000
    length: float = 50.0

    def sample(self, key: jax.Array, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        kx, kv1, kv2 = jax.random.split(key, 3)
        n1 = self.n_samples // 2
        n2 = self.n_samples - n1
        x = jax.random.uniform(kx, (self.n_samples,), minval=0.0, maxval=self.length, dtype=jnp.float32).astype(dtype)
        v_plus = _truncated_normal(kv1, n1, self.v0, self.sigma, -V_WINDOW, V_WINDOW, dtype)
        v_minus = _truncated_normal(kv2, n2, -self.v0, self.sigma, -V_WINDOW, V_WINDOW, dtype)
        return x, jnp.concatenate([v_plus, v_minus])

    def high_indices(self) -> jnp.ndarray:
        return jnp.arange(0)  # not applicable


@dataclasses.dataclass(frozen=True)
class BumpOnTail:
    """Maxwellian background + fast beam (`/root/reference/src/env/dist.py:104-195`).

    Background fraction 1/(1+a) is N(0, 1); the remaining particles are the
    beam N(v0, sigma) (`dist.py:160-183`). Beam particles occupy indices
    [N1, N) as in ``inject_high_electron_indice`` (`dist.py:191-195`).
    """

    a: float = 0.3
    v0: float = 4.0
    sigma: float = 0.5
    n_samples: int = 40000
    length: float = 10.0

    @property
    def n_background(self) -> int:
        return int(self.n_samples * (1.0 / (1.0 + self.a)))

    def sample(self, key: jax.Array, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        kx, kv1, kv2 = jax.random.split(key, 3)
        n1 = self.n_background
        n2 = self.n_samples - n1
        x = jax.random.uniform(kx, (self.n_samples,), minval=0.0, maxval=self.length, dtype=jnp.float32).astype(dtype)
        v_bg = _truncated_normal(kv1, n1, 0.0, 1.0, -V_WINDOW, V_WINDOW, dtype)
        v_beam = _truncated_normal(kv2, n2, self.v0, self.sigma, -V_WINDOW, V_WINDOW, dtype)
        return x, jnp.concatenate([v_bg, v_beam])

    def high_indices(self) -> jnp.ndarray:
        """Beam ('high energy') particle indices (`dist.py:191-195`)."""
        return jnp.arange(self.n_background, self.n_samples)


@dataclasses.dataclass(frozen=True)
class Maxwellian:
    """Maxwellian plasma with a density perturbation — the textbook Landau-
    damping initial condition (NEW capability, no reference analogue: the
    reference only ships the two beam instabilities and seeds them with a
    multiplicative *velocity* perturbation, `/root/reference/src/env/pic.py:68`;
    linear Landau damping is instead excited by a density perturbation
    n(x) = n0 (1 + A cos(k x)) on a thermal background).

    Positions are sampled by exact inverse-CDF: F(x) = (x + (A/k) sin(kx))/L
    inverted with a fixed-count Newton iteration (monotone for A < 1,
    quadratic convergence; 6 iterations reach fp32 roundoff for A <= 0.5).
    Velocities are the truncated thermal Maxwellian.
    """

    vth: float = 1.0
    amplitude: float = 0.1  # A
    mode: int = 1  # k = 2 pi mode / L
    n_samples: int = 40000
    length: float = 50.0

    def sample(self, key: jax.Array, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        kx, kv = jax.random.split(key)
        k = 2.0 * jnp.pi * self.mode / self.length
        a_over_k = self.amplitude / k
        u = jax.random.uniform(kx, (self.n_samples,), dtype=jnp.float32) * self.length
        x = u
        for _ in range(6):
            x = x - (x + a_over_k * jnp.sin(k * x) - u) / (1.0 + self.amplitude * jnp.cos(k * x))
        x = jnp.mod(x, self.length).astype(dtype)
        v = _truncated_normal(kv, self.n_samples, 0.0, self.vth, -V_WINDOW, V_WINDOW, dtype)
        return x, v

    def high_indices(self) -> jnp.ndarray:
        return jnp.arange(0)  # not applicable


def make_distribution(cfg: SimConfig):
    """Distribution from config, matching the dispatch in
    `/root/reference/run_wo_oc.py:75-79`."""
    if cfg.simcase == "two-stream":
        return TwoStream(v0=cfg.vb, sigma=cfg.vth, n_samples=cfg.n_particles, length=cfg.length)
    if cfg.simcase == "bump-on-tail":
        return BumpOnTail(a=cfg.bump_a, v0=cfg.vb, sigma=cfg.vth, n_samples=cfg.n_particles, length=cfg.length)
    if cfg.simcase == "landau":
        return Maxwellian(
            vth=cfg.vth, amplitude=cfg.perturb_amplitude, mode=cfg.perturb_mode,
            n_samples=cfg.n_particles, length=cfg.length,
        )
    raise ValueError(f"unknown simcase {cfg.simcase}")


def sample_initial_state(cfg: SimConfig, key: jax.Array, dtype=jnp.float32):
    """Sample (x, v) and apply the multiplicative velocity perturbation
    ``v *= 1 + A sin(2 pi n_mode x / L)`` (`/root/reference/src/env/pic.py:68`).

    The ``landau`` case carries its perturbation in the positions (density
    perturbation, the textbook linear-Landau setup) — the velocity
    perturbation is skipped there."""
    dist = make_distribution(cfg)
    x, v = dist.sample(key, dtype=dtype)
    if cfg.simcase != "landau":
        v = v * (1.0 + cfg.perturb_amplitude * jnp.sin(2.0 * jnp.pi * cfg.perturb_mode * x / cfg.length))
    return x, v
