"""Flax network definitions for the RL controllers.

Capability parity with the reference's PyTorch modules:

* ``ParticleEncoder`` — DeepSets permutation-invariant encoder
  (`/root/reference/src/control/rl/encode.py:4-38`).
* ``DDPGActor``/``DDPGCritic`` — encoder + 3x(Dense+LayerNorm+ReLU) trunks
  (`/root/reference/src/control/rl/ddpg.py:54-186`).
* ``PPOActorCritic`` — shared trunk, Gaussian policy with learned global
  log_std, value head (`/root/reference/src/control/rl/ppo.py:47-130`).
  NOTE: the reference stores x_norm/v_norm but never applies them in
  ``forward`` (`ppo.py:93-95`) — reproduced (raw state into the encoder).
* ``SACActor``/``SACCritic`` — raw-MLP (no encoder), pre-LayerNorm + tanh
  activations, clamped mu/log_std (`/root/reference/src/control/rl/sac.py:48-188`).

Quirks preserved deliberately (documented so parity is auditable):
- SAC's log-prob has no tanh-squash Jacobian correction (`sac.py:124-126`).
- The action rescale ``(0.5 + 0.5*y)*(max-min)+min`` maps y in [-1, 1]
  affinely onto [min, max] (`ddpg.py:129-131`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "ParticleEncoder",
    "SpectralEncoder",
    "DDPGActor",
    "SpectralActor",
    "SpectralAttentionActor",
    "DDPGCritic",
    "PPOActorCritic",
    "SACActor",
    "SACCritic",
]


def _rescale(y: jax.Array, lo: float, hi: float) -> jax.Array:
    """Affine map [-1, 1] -> [lo, hi] (`ddpg.py:129-131`)."""
    return (0.5 + 0.5 * y) * (hi - lo) + lo


class ParticleEncoder(nn.Module):
    """DeepSets encoder: per-particle (cos q', sin q', p) -> phi-MLP -> mean
    -> rho-MLP (`encode.py:27-38`). Input (..., 2N)."""

    hidden_dim: int
    output_dim: int
    length: float = 50.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = x.shape[-1] // 2
        q, p = x[..., :n], x[..., n:]
        ang = q * (2.0 * jnp.pi / self.length)
        z = jnp.stack([jnp.cos(ang), jnp.sin(ang), p], axis=-1)  # (..., N, 3)
        z = nn.Dense(self.hidden_dim)(z)
        z = nn.LayerNorm()(z)
        z = nn.relu(z)
        z = jnp.mean(z, axis=-2)  # permutation-invariant pool
        z = nn.Dense(self.output_dim)(z)
        z = nn.LayerNorm()(z)
        return nn.relu(z)


class SpectralEncoder(nn.Module):
    """Physics-informed permutation-invariant encoder (NEW capability, no
    reference analogue): the per-mode phase-space moments

        c_m = mean cos(k_m x),  s_m = mean sin(k_m x)          (density)
        vc_m = mean v cos(k_m x),  vs_m = mean v sin(k_m x)    (current)

    for m = 1..n_modes, plus the bulk moments (mean v, mean v^2). These are
    exactly the sufficient statistics of the low-mode wave dynamics the MPC
    planner controls (the phase-conjugate expert is literally a function of
    (c_m, s_m), `/root/reference/run_feedback.py:130-143`; the spectral
    planning model evolves these same sums) — unlike the DeepSets mean-pool
    (`encode.py:27-38`), no phase information is lost, and the feature
    dimension is 2*(v_order+1)*n_modes + (v_order+1) instead of a learned
    pooling over 2N inputs.
    Built with the same angle-addition recurrence as the spectral planner.

    ``v_order`` extends the per-mode moments up the linearized-Vlasov
    hierarchy: order 1 = density + current (the wave's amplitude and phase
    velocity), order 2 adds per-mode pressure (v^2 c_m, v^2 s_m), order 3
    the heat flux (v^3 ...). Each mode's density moment is driven by the
    current moment, the current by the pressure, ... — a higher order hands
    the actor the closure information the planner recovers by rolling the
    dynamics forward.
    """

    n_modes: int = 8
    length: float = 50.0
    v_order: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = x.shape[-1] // 2
        q, p = x[..., :n], x[..., n:]
        ang = q * (2.0 * jnp.pi / self.length)
        c1, s1 = jnp.cos(ang), jnp.sin(ang)
        # v^j weight planes, j = 0..v_order (v^0 = density plane)
        powers = [jnp.ones_like(p)]
        for _ in range(self.v_order):
            powers.append(powers[-1] * p)
        feats = []
        c_prev, s_prev = c1, s1
        for m in range(self.n_modes):
            if m > 0:
                c_next = c_prev * c1 - s_prev * s1
                s_next = s_prev * c1 + c_prev * s1
                c_prev, s_prev = c_next, s_next
            for w in powers:
                feats += [
                    jnp.mean(w * c_prev, axis=-1),
                    jnp.mean(w * s_prev, axis=-1),
                ]
        # bulk moments <v^j>, j = 1..v_order+1 (order-1 default keeps the
        # original (mean v, mean v^2) pair)
        bulk = p
        for _ in range(self.v_order + 1):
            feats.append(jnp.mean(bulk, axis=-1))
            bulk = bulk * p
        return jnp.stack(feats, axis=-1)


class SpectralActor(nn.Module):
    """Deterministic actor over :class:`SpectralEncoder` features — the
    amortized-MPC distillation target (``DDPGConfig.encoder="spectral"``).
    Same ``sample`` interface/action rescale as :class:`DDPGActor`."""

    mlp_dim: int
    n_actions: int
    n_modes: int = 8
    output_min: float = -1.0
    output_max: float = 1.0
    length: float = 50.0
    v_order: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        z = SpectralEncoder(self.n_modes, self.length, self.v_order)(x)
        z = _LNTrunk(self.mlp_dim)(z)
        return jnp.tanh(nn.Dense(self.n_actions)(z))

    def sample(self, params, x):
        mu = self.apply(params, x)
        return _rescale(mu, self.output_min, self.output_max)


class SpectralAttentionActor(nn.Module):
    """Mode-token transformer actor — the capacity lever DEVNOTES carried
    for three rounds ("a bigger actor (attention …) is the only plausible
    lever"; VERDICT r3 #5).

    Architecture (NEW capability, no reference analogue — the reference's
    actors are DeepSets-MLPs, `/root/reference/src/control/rl/ddpg.py:54-133`):

    * Each Fourier mode m = 1..n_modes becomes a TOKEN carrying its
      :class:`SpectralEncoder` phase-space moments (v^j-weighted cos/sin
      sums — the wave's amplitude, phase, and hierarchy closures), embedded
      with a learned per-mode positional embedding. The bulk moments
      (<v^j>) form one extra global token.
    * ``n_layers`` pre-LN self-attention blocks mix the modes. This is the
      structural upgrade over :class:`SpectralActor`'s flat MLP: the
      two-stream saturation stage couples modes (harmonic generation,
      mode competition), and attention represents those couplings with
      weight sharing across mode pairs instead of asking a 34-input MLP to
      memorize them coordinate-by-coordinate.
    * PER-MODE output heads: the action space is exactly one (cos, sin)
      coefficient pair per actuator mode, so token m <= n_actions/2 emits
      its own pair through a shared Dense(2) — the output path keeps the
      mode alignment the phase-conjugate structure of the control law
      suggests, rather than regenerating all 2K coefficients from a pooled
      vector.

    Same ``sample`` interface/action rescale as :class:`DDPGActor`.
    """

    mlp_dim: int  # kept for interface parity; used for the head MLP width
    n_actions: int  # 2 * max_mode, packed [cos(1..K), sin(1..K)]
    n_modes: int = 8
    output_min: float = -1.0
    output_max: float = 1.0
    length: float = 50.0
    v_order: int = 1
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.n_actions // 2 > self.n_modes:
            # without this the per-mode head slice would silently consume
            # the global bulk token (wrong physics for the top actuated
            # mode) or emit a short action vector (cryptic downstream
            # shape error) — review finding r4
            raise ValueError(
                f"SpectralAttentionActor needs n_modes >= n_actions/2 "
                f"(one token per actuated mode); got n_modes={self.n_modes}, "
                f"n_actions={self.n_actions}"
            )
        feats = SpectralEncoder(self.n_modes, self.length, self.v_order)(x)
        per_mode = 2 * (self.v_order + 1)
        n_bulk = self.v_order + 1
        mode_feats = feats[..., : self.n_modes * per_mode].reshape(
            feats.shape[:-1] + (self.n_modes, per_mode)
        )
        bulk = feats[..., self.n_modes * per_mode:]  # (..., n_bulk)
        assert bulk.shape[-1] == n_bulk

        tok = nn.Dense(self.d_model)(mode_feats)  # (..., M, d)
        tok = tok + self.param(
            "mode_embed",
            nn.initializers.normal(0.02),
            (self.n_modes, self.d_model),
        )
        g = nn.Dense(self.d_model)(bulk)[..., None, :]  # global bulk token
        z = jnp.concatenate([tok, g], axis=-2)  # (..., M+1, d)

        for _ in range(self.n_layers):
            h = nn.LayerNorm()(z)
            z = z + nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model
            )(h, h)
            h = nn.LayerNorm()(z)
            z = z + nn.Dense(self.d_model)(nn.gelu(nn.Dense(2 * self.d_model)(h)))

        z = nn.LayerNorm()(z)
        # per-mode (cos, sin) heads for the actuated modes; a small MLP
        # before the shared pair head keeps per-token capacity
        k_act = self.n_actions // 2
        zh = nn.relu(nn.Dense(self.mlp_dim)(z[..., :k_act, :]))
        pair = nn.Dense(2)(zh)  # (..., k_act, 2)
        y = jnp.concatenate([pair[..., 0], pair[..., 1]], axis=-1)  # packed
        return jnp.tanh(y)

    def sample(self, params, x):
        mu = self.apply(params, x)
        return _rescale(mu, self.output_min, self.output_max)


class _LNTrunk(nn.Module):
    """3x(Dense + LayerNorm + ReLU) trunk shared by DDPG nets (`ddpg.py:85-121`)."""

    mlp_dim: int

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        for _ in range(3):
            z = nn.relu(nn.LayerNorm()(nn.Dense(self.mlp_dim)(z)))
        return z


class DDPGActor(nn.Module):
    """Deterministic actor (`ddpg.py:54-133`): state (..., 2N) -> action (..., A)."""

    mlp_dim: int
    n_actions: int
    output_min: float = -1.0
    output_max: float = 1.0
    x_norm: float = 1.0
    v_norm: float = 10.0
    length: float = 50.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = x.shape[-1] // 2
        z = jnp.concatenate([x[..., :n] / self.x_norm, x[..., n:] / self.v_norm], axis=-1)
        z = ParticleEncoder(self.mlp_dim, self.mlp_dim, self.length)(z)
        z = _LNTrunk(self.mlp_dim)(z)
        return jnp.tanh(nn.Dense(self.n_actions)(z))

    def sample(self, params, x):
        mu = self.apply(params, x)
        return _rescale(mu, self.output_min, self.output_max)


class DDPGCritic(nn.Module):
    """Q(s, a) (`ddpg.py:135-186`)."""

    mlp_dim: int
    x_norm: float = 1.0
    v_norm: float = 10.0
    length: float = 50.0

    @nn.compact
    def __call__(self, x: jax.Array, a: jax.Array) -> jax.Array:
        n = x.shape[-1] // 2
        z = jnp.concatenate([x[..., :n] / self.x_norm, x[..., n:] / self.v_norm], axis=-1)
        z = ParticleEncoder(self.mlp_dim, self.mlp_dim, self.length)(z)
        z = jnp.concatenate([z, a], axis=-1)
        z = _LNTrunk(self.mlp_dim)(z)
        return nn.Dense(1)(z)


class PPOActorCritic(nn.Module):
    """Shared-trunk Gaussian policy + value head (`ppo.py:47-130`)."""

    mlp_dim: int
    n_actions: int
    std_init: float = 0.25
    output_min: float = -1.0
    output_max: float = 1.0
    length: float = 50.0

    @nn.compact
    def __call__(self, x: jax.Array):
        z = ParticleEncoder(self.mlp_dim, self.mlp_dim, self.length)(x)
        z = _LNTrunk(self.mlp_dim)(z)
        mu = jnp.tanh(nn.Dense(self.n_actions)(z))
        value = nn.Dense(1)(z)
        log_std = self.param(
            "log_std", lambda _k: jnp.full((self.n_actions,), jnp.log(self.std_init), jnp.float32)
        )
        std = jnp.broadcast_to(jnp.exp(log_std), mu.shape)
        return mu, std, value

    def sample(self, params, x, key=None, deterministic: bool = False):
        """Returns (action, entropy, log_prob, value), matching
        ``ActorCritic.sample`` (`ppo.py:105-121`)."""
        mu, std, value = self.apply(params, x)
        if deterministic or key is None:
            y = mu
        else:
            y = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
        action = _rescale(y, self.output_min, self.output_max)
        log_prob = jnp.sum(
            -0.5 * ((y - mu) / std) ** 2 - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi),
            axis=-1,
            keepdims=True,
        )
        entropy = jnp.mean(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std))
        return action, entropy, log_prob, value


class SACActor(nn.Module):
    """Gaussian actor with tanh squash (`sac.py:48-134`): raw 2N-input MLP,
    pre-LayerNorm + tanh activations; clamped mu/log_std. The log-prob omits
    the tanh Jacobian term, as in the reference (`sac.py:124-126`)."""

    mlp_dim: int
    n_actions: int
    mu_min: float = -10.0
    mu_max: float = 10.0
    log_std_min: float = -2.0
    log_std_max: float = 2.0
    output_min: float = -1.0
    output_max: float = 1.0
    x_norm: float = 50.0
    v_norm: float = 10.0

    @nn.compact
    def __call__(self, x: jax.Array):
        n = x.shape[-1] // 2
        z = jnp.concatenate([x[..., :n] / self.x_norm, x[..., n:] / self.v_norm], axis=-1)
        z = jnp.tanh(nn.Dense(self.mlp_dim)(nn.LayerNorm()(z)))
        z = jnp.tanh(nn.Dense(self.mlp_dim)(nn.LayerNorm()(z)))
        z = jnp.tanh(nn.Dense(self.mlp_dim)(nn.LayerNorm()(z)))
        mu = jnp.clip(nn.Dense(self.n_actions)(z), self.mu_min, self.mu_max)
        log_std = jnp.clip(nn.Dense(self.n_actions)(z), self.log_std_min, self.log_std_max)
        return mu, log_std

    def sample(self, params, x, key=None, deterministic: bool = False):
        """Returns (action, entropy, log_prob) (`sac.py:112-132`)."""
        mu, log_std = self.apply(params, x)
        std = jnp.exp(log_std)
        if deterministic or key is None:
            xs = mu
        else:
            xs = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
        y = jnp.tanh(xs)
        action = _rescale(y, self.output_min, self.output_max)
        log_prob = jnp.sum(
            -0.5 * ((xs - mu) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi),
            axis=-1,
            keepdims=True,
        )
        entropy = jnp.mean(0.5 + 0.5 * jnp.log(2 * jnp.pi) + log_std)
        return action, entropy, log_prob


class _SACQNetwork(nn.Module):
    """(`sac.py:136-172`)"""

    mlp_dim: int
    x_norm: float = 50.0
    v_norm: float = 10.0

    @nn.compact
    def __call__(self, x: jax.Array, a: jax.Array):
        n = x.shape[-1] // 2
        z = jnp.concatenate([x[..., :n] / self.x_norm, x[..., n:] / self.v_norm], axis=-1)
        z = jnp.concatenate([z, a], axis=-1)
        z = jnp.tanh(nn.Dense(self.mlp_dim)(nn.LayerNorm()(z)))
        z = jnp.tanh(nn.Dense(self.mlp_dim)(nn.LayerNorm()(z)))
        z = jnp.tanh(nn.Dense(self.mlp_dim)(nn.LayerNorm()(z)))
        return nn.Dense(1)(z)


class SACCritic(nn.Module):
    """Twin Q (`sac.py:174-188`)."""

    mlp_dim: int
    x_norm: float = 50.0
    v_norm: float = 10.0

    @nn.compact
    def __call__(self, x: jax.Array, a: jax.Array):
        q1 = _SACQNetwork(self.mlp_dim, self.x_norm, self.v_norm)(x, a)
        q2 = _SACQNetwork(self.mlp_dim, self.x_norm, self.v_norm)(x, a)
        return q1, q2
