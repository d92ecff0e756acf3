"""Reward / cost computation for controllers.

Capability parity with class ``Reward``
(`/root/reference/src/control/rl/reward.py:5-76`): stores the equilibrium
f_eq captured from the initial state, exposes the three cost terms
(KL divergence, field energy, input energy), the training reward
``alpha*max(1 - PE/r_pe_n, 0) + beta*max(1 - IE/r_ie_n, 0)`` and the unused
tanh-shaped variants. All math is jittable.

Reference quirk preserved: ``compute_reward``'s second argument is *named*
``E_external`` but every caller passes the coefficient vector (DDPG/PPO,
`ddpg.py:455`, `ppo.py:340`) or the mesh field (SAC, `sac.py:361`) — the
input-energy term just squares whatever it gets. Here the argument is named
``action`` and documented.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .objective import estimate_electric_energy, estimate_f, estimate_kl_divergence

__all__ = ["Reward"]


class Reward:
    def __init__(
        self,
        init_state: jax.Array,
        n_mesh: int = 500,
        length: float = 50.0,
        vmin: float = -25.0,
        vmax: float = 25.0,
        n0: float = 1.0,
        alpha: float = 1.0,
        beta: float = 1.0,
        n_actions: int = 10,
    ):
        self.init_state = init_state
        self.n_mesh = n_mesh
        self.length = float(length)
        self.vmin = vmin
        self.vmax = vmax
        self.n0 = n0
        self.alpha = alpha
        self.beta = beta
        self.n_actions = n_actions

        self.feq = estimate_f(init_state, n_mesh, self.length, vmin, vmax, n0)
        # Normalizers (`reward.py:31-33`): r_ie_n = IE(ones(n_actions)) =
        # n_actions * L * 0.25, computed in Python so __init__ stays usable
        # inside jit traces.
        self.r_pe_n = 1.0
        self.r_ie_n = n_actions * self.length * 0.25
        # Initial-state field energy, the scale for the shaped reward (new
        # capability, not in the reference — see compute_reward_shaped).
        self.pe0 = self.compute_electric_energy(init_state)

    def reinit(self):
        self.feq = estimate_f(self.init_state, self.n_mesh, self.length, self.vmin, self.vmax, self.n0)

    # -- cost terms --------------------------------------------------------
    def compute_kl_divergence(self, state: jax.Array) -> jax.Array:
        f = estimate_f(state, self.n_mesh, self.length, self.vmin, self.vmax, self.n0)
        return estimate_kl_divergence(f, self.feq, self.length / self.n_mesh, (self.vmax - self.vmin) / self.n_mesh)

    def compute_electric_energy(self, state: jax.Array, e_external: Optional[jax.Array] = None) -> jax.Array:
        return estimate_electric_energy(state.reshape(-1), e_external, self.n_mesh, self.length, self.n0)

    def compute_input_energy(self, actions: jax.Array) -> jax.Array:
        return jnp.sum(actions**2) * self.length * 0.25

    def compute_cost(self, state: jax.Array, action: jax.Array):
        return (
            self.compute_kl_divergence(state),
            self.compute_electric_energy(state),
            self.compute_input_energy(action),
        )

    # -- shaped rewards (unused alternates, `reward.py:62-69`) -------------
    def compute_reward_kl_divergence(self, state):
        return jnp.tanh(1.0 - jnp.sqrt(self.compute_kl_divergence(state) / 25.0))

    def compute_reward_electric_energy(self, state, e_external=None):
        return jnp.tanh(1.0 - jnp.sqrt(self.compute_electric_energy(state, e_external) / 10.0))

    def compute_reward_input_energy(self, action):
        return jnp.tanh(1.0 - jnp.sqrt(self.compute_input_energy(action) / 50.0))

    # -- training reward (`reward.py:71-76`) -------------------------------
    def compute_reward(self, state: jax.Array, action: jax.Array) -> jax.Array:
        r_pe = jnp.maximum(1.0 - self.compute_electric_energy(state) / self.r_pe_n, 0.0)
        r_ie = jnp.maximum(1.0 - self.compute_input_energy(action) / self.r_ie_n, 0.0)
        return r_pe * self.alpha + r_ie * self.beta

    # -- scale-free shaped reward (new, not in the reference) ---------------
    def compute_reward_shaped(self, state: jax.Array, action: jax.Array) -> jax.Array:
        """``alpha/(1 + PE/PE0) + beta*max(1 - IE/r_ie_n, 0)``.

        Fixes the structural flatness of the reference reward at its own
        scales: ``max(1 - PE, 0)`` is identically zero whenever PE > 1 —
        always, at reference workloads (PE ~ 10-400) — so the field-energy
        term carries no learning signal (`reward.py:71-76` semantics,
        DEVNOTES 'RL controller findings'). The shaped field term is smooth,
        strictly decreasing in PE, positive and bounded (safe as a
        reward-*weight* in the BC terms, which a ``-log PE`` shaping is not),
        and scale-free: PE is normalized by the episode's initial field
        energy PE0, giving r_pe = 0.5 at the start, -> alpha as the field is
        suppressed, -> 0 as the instability grows.
        """
        r_pe = 1.0 / (1.0 + self.compute_electric_energy(state) / self.pe0)
        r_ie = jnp.maximum(1.0 - self.compute_input_energy(action) / self.r_ie_n, 0.0)
        return r_pe * self.alpha + r_ie * self.beta

    def reward_fn(self, shape: str = "reference"):
        """Select the training reward: ``"reference"`` (`reward.py:71-76`
        parity) or ``"shaped"`` (:meth:`compute_reward_shaped`)."""
        if shape == "reference":
            return self.compute_reward
        if shape == "shaped":
            return self.compute_reward_shaped
        raise ValueError(f"unknown reward shape {shape!r} (use 'reference' or 'shaped')")
