"""Fused Pallas GRID-planner kernels — DEMOTED experimental code (round 4).

These kernels (whole leapfrog step, whole-KDK horizon, packed-lane KDK
horizon) are correct (experiments/test_pallas_fused_step.py) but MEASURED
LOSERS against XLA's fusion at every planning shape tried on v5e — ~2-3x
slower (DEVNOTES performance map: fused 116-137 solves/s, packed 172, vs
XLA staggered-KDK 399). Mosaic schedules the (BB, N, M=64) weight tiles
with the mesh axis on the 128-lane dimension at half utilization, and the
per-step dynamic-slice + iota-compare weight construction doesn't pipeline
the way XLA's fused layout choices do. The winning spectral whole-horizon
kernel (plasma_control_tpu/ops/pallas/spectral_horizon.py) superseded them
as the TPU planning default; per VERDICT r3 #6 they live here so
``ops/pallas/`` carries only winning or load-bearing kernels. Retry on a
newer Mosaic toolchain, or use as a starting point for shapes with M >= 128
(full lane utilization without packing).

Not importable from the package: ``MPCConfig.plan_kernel`` no longer
accepts the grid-model "fused"/"packed" values. To experiment, import this
module directly (it is self-contained Pallas + the grid's circulant E
operator) — see experiments/test_pallas_fused_step.py for exact XLA-path
equivalence checks and experiments/bench_kdk*.py for the measurement
harnesses.

Original module docstring follows.

----

Fused Pallas TPU kernel: one whole leapfrog planning step per launch.

The MPC planner's hot loop is ``K candidates x H steps`` of the reduced-model
leapfrog step (`plasma_control_tpu/control/mpc.py::_step_and_pe`): half-drift,
CIC deposit, circulant Poisson solve, gather, kick, half-drift, plus an exact
post-step field re-solve for the cost. On the XLA path each of those is a
separate op and the (K, N, M) CIC weight tensor is materialized in HBM twice
per step (deposit reduction + gather matmul operand) — at the benchmark
planning shapes (K=512, N=1024, M=64) that is ~128 MB of HBM traffic per
weight use.

This kernel instead runs the ENTIRE step for a tile of ``BB`` candidates in
one launch: the weight tile lives in a VMEM scratch, is computed once per
position evaluation and consumed immediately (sum-reduction for the deposit,
MXU contraction for both the Poisson solve and the gather). HBM sees only
(x, v, E_ext) in and (x', v', E_post) out — O(B*N) instead of O(B*N*M).

Weight layout is (BB, N, M) — mesh axis last — because Mosaic's batched
matmul requires the lhs contracting dim (the gather's mesh contraction) to be
the trailing dim when the rhs is vector-like.

Semantics match ``_step_and_pe(..., plan_integrator="leapfrog")`` exactly
(same ops, fp32): position-Verlet drift-kick-drift with zero-order-hold
external field added to the self-consistent mesh field before the gather
(reference parity: `/root/reference/src/env/util.py:102-111`), and with
``exact=True`` the returned mesh field is re-solved at the post-step
positions (the MPC cost fidelity default, see MPCConfig.exact_cost_energy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_leapfrog_step",
    "fused_kdk_horizon",
    "fused_packed_horizon",
    "fused_step_supported",
    "packed_horizon_supported",
]

_BB = 8  # candidate tile (sublane multiple)
_VMEM_SCRATCH_BUDGET = 8 * 1024 * 1024  # bytes for the (BB, M, N) weight tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_step_supported(n_particles: int, n_mesh: int, kind: str = "cic") -> bool:
    """True if the (BB, M, N_pad) weight scratch fits the VMEM budget."""
    n_pad = _round_up(n_particles, 128)
    return kind == "cic" and _BB * n_mesh * n_pad * 4 <= _VMEM_SCRATCH_BUDGET


def _weights(x_tile, n_mesh: int, inv_dx: float, n_valid: int, n_pad: int):
    """(BB, N, M) CIC hat weights at wrapped positions; padded rows zeroed.

    Layout note: the mesh axis is LAST because Mosaic's batched matmul
    requires the lhs contracting dim to be the trailing dim when the rhs is
    vector-like (the gather contraction below); this matches the proven
    :mod:`.cic_pallas` layout.
    """
    bb, n = x_tile.shape
    pos = x_tile * inv_dx  # (BB, N) in cell units, in [0, M)
    # NB Mosaic requires an integer iota (float iota fails verification)
    j = jax.lax.broadcasted_iota(jnp.int32, (bb, n, n_mesh), 2).astype(jnp.float32)
    d = pos[:, :, None] - j
    d = d - n_mesh * jnp.round(d * (1.0 / n_mesh))  # periodic wrap
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    if n_valid != n_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, (bb, n, n_mesh), 1)
        w = jnp.where(row < n_valid, w, 0.0)
    return w


def _solve(dens, eop_t_ref, n0: float):
    # (BB, M) @ (M, M) on the MXU: E_mesh = (n - n0) @ e_op.T
    return jax.lax.dot_general(
        dens - n0,
        eop_t_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather(w, e_tot):
    # a[b, n] = sum_m w[b, n, m] * e[b, m] — batched MXU contraction.
    # Mosaic constraint: lhs contracting dim must be the LAST dim and rhs
    # vector-like (B, K); other orientations fail to lower.
    return jax.lax.dot_general(
        w,
        e_tot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(
    x_ref, v_ref, eext_ref, eop_t_ref,  # inputs
    xo_ref, vo_ref, eo_ref,  # outputs
    w_scr,  # VMEM scratch (BB, M, N)
    *, n_mesh, n_valid, n_pad, length, dt, norm, n0, exact,
):
    inv_dx = n_mesh / length
    x = x_ref[:, :]
    v = v_ref[:, :]

    xh = x + (0.5 * dt) * v
    xh = jnp.mod(xh, length)
    w_scr[:, :, :] = _weights(xh, n_mesh, inv_dx, n_valid, n_pad)
    w = w_scr[:, :, :]
    dens = jnp.sum(w, axis=1) * norm  # (BB, M)
    e_self = _solve(dens, eop_t_ref, n0)
    e_tot = e_self + eext_ref[:, :]
    accel = -_gather(w, e_tot)  # (BB, N)

    vn = v + dt * accel
    xn = jnp.mod(xh + (0.5 * dt) * vn, length)
    xo_ref[:, :] = xn
    vo_ref[:, :] = vn

    if exact:
        w_scr[:, :, :] = _weights(xn, n_mesh, inv_dx, n_valid, n_pad)
        dens2 = jnp.sum(w_scr[:, :, :], axis=1) * norm
        eo_ref[:, :] = _solve(dens2, eop_t_ref, n0)
    else:
        eo_ref[:, :] = e_self


def _fused_impl(
    x: jax.Array,  # (B, N) positions in [0, L)
    v: jax.Array,  # (B, N)
    e_ext: jax.Array,  # (B, M) external mesh field (zero-order hold)
    e_op_t: jax.Array,  # (M, M) == grid.e_op.T
    *,
    n_mesh: int,
    length: float,
    dt: float,
    n_valid: int,
    n0: float = 1.0,
    exact: bool = True,
    interpret: bool = False,
):
    b, n = x.shape
    b_pad = _round_up(b, _BB)
    n_pad = _round_up(n, 128)
    if (b_pad, n_pad) != (b, n):
        x = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n)))
        v = jnp.pad(v, ((0, b_pad - b), (0, n_pad - n)))
        e_ext = jnp.pad(e_ext, ((0, b_pad - b), (0, 0)))
    norm = n0 * length / n_valid / (length / n_mesh)

    kernel = functools.partial(
        _kernel,
        n_mesh=n_mesh, n_valid=n_valid, n_pad=n_pad,
        length=float(length), dt=float(dt), norm=float(norm),
        n0=float(n0), exact=bool(exact),
    )
    f32 = jnp.float32
    xo, vo, eo = pl.pallas_call(
        kernel,
        grid=(b_pad // _BB,),
        in_specs=[
            pl.BlockSpec((_BB, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, n_mesh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mesh, n_mesh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BB, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, n_mesh), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, n_pad), f32),
            jax.ShapeDtypeStruct((b_pad, n_pad), f32),
            jax.ShapeDtypeStruct((b_pad, n_mesh), f32),
        ],
        scratch_shapes=[pltpu.VMEM((_BB, n_pad, n_mesh), f32)],
        interpret=interpret,
    )(x.astype(f32), v.astype(f32), e_ext.astype(f32), e_op_t.astype(f32))
    return xo[:b, :n], vo[:b, :n], eo[:b]


_FUSED_CACHE = {}


def _fused_op(n_mesh, length, dt, n_valid, n0, exact, interpret):
    key = (n_mesh, float(length), float(dt), n_valid, float(n0), exact, interpret)
    if key in _FUSED_CACHE:
        return _FUSED_CACHE[key]
    kw = dict(
        n_mesh=n_mesh, length=length, dt=dt, n_valid=n_valid, n0=n0,
        exact=exact, interpret=interpret,
    )

    @jax.custom_batching.custom_vmap
    def op(x, v, e_ext, e_op_t):
        xo, vo, eo = _fused_impl(x[None], v[None], e_ext[None], e_op_t, **kw)
        return xo[0], vo[0], eo[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, x, v, e_ext, e_op_t):
        # Any operand may arrive unbatched (e.g. the initial scan carry during
        # the vmap-of-scan batching fixed-point); broadcast it to the batch.
        xb, vb, eb, ob = in_batched
        assert not ob, "e_op must be unbatched"
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        if not vb:
            v = jnp.broadcast_to(v, (axis_size,) + v.shape)
        if not eb:
            e_ext = jnp.broadcast_to(e_ext, (axis_size,) + e_ext.shape)
        out = _fused_impl(x, v, e_ext, e_op_t, **kw)
        return out, (True, True, True)

    _FUSED_CACHE[key] = op
    return op


# ---------------------------------------------------------------------------
# Whole-horizon KDK kernel: the MPC candidate rollout in ONE launch.
#
# Velocity-Verlet (kick-drift-kick) makes the self-consistent field at each
# step boundary shared between kick2 of step t and kick1 of step t+1, and the
# external Fourier field enters as a precomputed mesh sequence (gather is
# linear: gather(w, E_self + Bm @ u) — no per-particle basis needed). With the
# horizon loop inside the kernel, the VMEM weight tile computed after each
# drift serves BOTH kicks that straddle it: exactly ONE CIC weight evaluation
# per planning step (the XLA DKD-exact path needs 3). HBM sees only the
# shared initial state (broadcast across the candidate grid via the index
# map, never materialized per candidate), the (K, H, M) external-field
# sequences, and the (K, H) per-step field energies out.
# ---------------------------------------------------------------------------


def _kdk_kernel(
    x_ref, v_ref, uext_ref, eop_t_ref,  # (1, N) (1, N) (BB, H, M) (M, M)
    pe_ref,  # out (BB, H): 0.5 * sum(E_self^2) * dx after each step
    w_scr,  # VMEM scratch (BB, N, M)
    *, n_mesh, n_valid, n_pad, length, dt, norm, n0, horizon,
):
    inv_dx = n_mesh / length
    dx = length / n_mesh
    bb = pe_ref.shape[0]
    x = jnp.broadcast_to(x_ref[:, :], (bb, n_pad))
    v = jnp.broadcast_to(v_ref[:, :], (bb, n_pad))

    w_scr[:, :, :] = _weights(x, n_mesh, inv_dx, n_valid, n_pad)
    dens = jnp.sum(w_scr[:, :, :], axis=1) * norm
    e_self = _solve(dens, eop_t_ref, n0)

    for t in range(horizon):  # static unroll; weights reused across the kicks
        e_tot = e_self + uext_ref[:, t, :]
        a1 = -_gather(w_scr[:, :, :], e_tot)
        vh = v + (0.5 * dt) * a1
        x = jnp.mod(x + dt * vh, length)
        w_scr[:, :, :] = _weights(x, n_mesh, inv_dx, n_valid, n_pad)
        dens = jnp.sum(w_scr[:, :, :], axis=1) * norm
        e_self = _solve(dens, eop_t_ref, n0)
        a2 = -_gather(w_scr[:, :, :], e_self + uext_ref[:, t, :])
        v = vh + (0.5 * dt) * a2
        pe_ref[:, t] = 0.5 * dx * jnp.sum(e_self * e_self, axis=1)


def fused_kdk_horizon(
    x: jax.Array,  # (N,) shared initial positions in [0, L)
    v: jax.Array,  # (N,)
    u_mesh_seq: jax.Array,  # (K, H, M) external mesh-field sequences
    e_op_t: jax.Array,  # (M, M) == grid.e_op.T
    *,
    n_mesh: int,
    length: float,
    dt: float,
    n0: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """K candidate H-step KDK rollouts fully fused; returns (K, H) per-step
    field energy ``0.5 * sum(E_self^2) * dx`` (callers apply the N/L rescale
    of :func:`plasma_control_tpu.ops.fields.electric_energy`)."""
    (n,) = x.shape
    k, h, m = u_mesh_seq.shape
    assert m == n_mesh
    k_pad = _round_up(k, _BB)
    n_pad = _round_up(n, 128)
    if n_pad != n:
        x = jnp.pad(x, (0, n_pad - n))
        v = jnp.pad(v, (0, n_pad - n))
    if k_pad != k:
        u_mesh_seq = jnp.pad(u_mesh_seq, ((0, k_pad - k), (0, 0), (0, 0)))
    norm = n0 * length / n / (length / n_mesh)

    kernel = functools.partial(
        _kdk_kernel,
        n_mesh=n_mesh, n_valid=n, n_pad=n_pad,
        length=float(length), dt=float(dt), norm=float(norm),
        n0=float(n0), horizon=h,
    )
    f32 = jnp.float32
    pe = pl.pallas_call(
        kernel,
        grid=(k_pad // _BB,),
        in_specs=[
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, h, n_mesh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mesh, n_mesh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BB, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, h), f32),
        scratch_shapes=[pltpu.VMEM((_BB, n_pad, n_mesh), f32)],
        interpret=interpret,
    )(
        x.astype(f32)[None],
        v.astype(f32)[None],
        u_mesh_seq.astype(f32),
        e_op_t.astype(f32),
    )
    return pe[:k]


# ---------------------------------------------------------------------------
# Packed-lane staggered-kick horizon kernel ("v3").
#
# Two structural wins over :func:`fused_kdk_horizon`:
#
# 1. **Full 128-lane utilization.** At planning mesh sizes M <= 64 the
#    (BB, N, M) weight tiles of the v2 kernels run the mesh axis on the
#    128-wide lane dimension at <= half occupancy — every VPU pass wastes
#    >= half its lanes. Here ``p = 128 // M`` *candidates* share each lane
#    row: lanes [c*M, (c+1)*M) hold candidate-member c's weights/fields.
#    The dominant elementwise weight evaluation, the deposit reduction, and
#    the Poisson solve (one (BB,128)@(128,128) MXU matmul against the
#    block-diagonal operator diag(e_op.T, ..., e_op.T)) all run full-lane.
#
# 2. **Merged half-kicks (staggered velocities).** KDK's kick2 of step t and
#    kick1 of step t+1 share the weight tile w(x_{t+1}); by linearity of the
#    gather they merge into ONE contraction with the combined field
#    2*E_self + u_t + u_{t+1} (see control/mpc.py::_horizon_cost_kdk).
#    Tracking only half-step velocities, each planning step costs exactly
#    one weight evaluation, one deposit reduce, one solve, and one gather
#    (p masked contractions, same cycles as one unpacked gather pair).
#
# Candidate trajectories are identical to explicit KDK up to fp
# reassociation of the two half-kicks; the per-step field energies entering
# the MPC cost are exact by construction.
# ---------------------------------------------------------------------------


def packed_horizon_supported(n_particles: int, n_mesh: int, kind: str = "cic") -> bool:
    """True if the packed (BB, N_pad, 128) weight scratch fits the budget and
    the mesh fits in the 128-lane row (p = 128 // n_mesh >= 1)."""
    n_pad = _round_up(n_particles, 128)
    return kind == "cic" and n_mesh <= 128 and _BB * 128 * n_pad * 4 <= _VMEM_SCRATCH_BUDGET


def _packed_kernel(
    x_ref, v_ref, u_ref, eop_ref,  # (1, N) (1, N) (BB, H, 128) (128, 128)
    pe2_ref,  # out (BB, H, 128): (0.5*dx) * E_self^2 per lane (caller reduces)
    xs, vs, w_scr,  # VMEM scratch: (BB, p, N), (BB, p, N), (BB, N, 128)
    *, p, n_mesh, n_valid, n_pad, length, dt, norm, n0, horizon,
):
    inv_dx = n_mesh / length
    dx = length / n_mesh
    bb = pe2_ref.shape[0]
    lanes = p * n_mesh

    def weights():
        """w_scr <- packed CIC weights at the current xs (one eval)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (bb, n_pad, 128), 2)
        # member-select positions: lanes [c*M,(c+1)*M) read candidate c
        pos = jnp.broadcast_to(xs[:, p - 1, :][:, :, None], (bb, n_pad, 128))
        for c in range(p - 2, -1, -1):
            pos = jnp.where(lane < (c + 1) * n_mesh, xs[:, c, :][:, :, None], pos)
        jm = jnp.remainder(lane, n_mesh).astype(jnp.float32)
        d = pos * inv_dx - jm
        d = d - n_mesh * jnp.round(d * (1.0 / n_mesh))  # periodic wrap
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        if lanes != 128:
            w = jnp.where(lane < lanes, w, 0.0)
        if n_valid != n_pad:
            row = jax.lax.broadcasted_iota(jnp.int32, (bb, n_pad, 128), 1)
            w = jnp.where(row < n_valid, w, 0.0)
        w_scr[:, :, :] = w

    def solve():
        dens = jnp.sum(w_scr[:, :, :], axis=1) * norm  # (BB, 128)
        return _solve(dens, eop_ref, n0)

    def kick(f, scale):
        """vs <- vs - scale * gather(w, f_member) for each packed member."""
        member = jax.lax.broadcasted_iota(jnp.int32, (bb, 128), 1) // n_mesh
        for c in range(p):
            fc = jnp.where(member == c, f, 0.0)
            a = _gather(w_scr[:, :, :], fc)  # (BB, N)
            vs[:, c, :] = vs[:, c, :] - scale * a

    for c in range(p):
        xs[:, c, :] = jnp.broadcast_to(x_ref[:, :], (bb, n_pad))
        vs[:, c, :] = jnp.broadcast_to(v_ref[:, :], (bb, n_pad))

    # prologue: first half-kick with the step-0 field
    weights()
    e_self = solve()
    kick(e_self + u_ref[:, 0, :], 0.5 * dt)

    for t in range(horizon):  # static unroll
        xs[:, :, :] = jnp.mod(xs[:, :, :] + dt * vs[:, :, :], length)
        weights()
        e_self = solve()
        pe2_ref[:, t, :] = (0.5 * dx) * e_self * e_self
        if t + 1 < horizon:
            # merged kick2_t + kick1_{t+1}: one gather, combined field
            kick(2.0 * e_self + u_ref[:, t, :] + u_ref[:, t + 1, :], 0.5 * dt)


def fused_packed_horizon(
    x: jax.Array,  # (N,) shared initial positions in [0, L)
    v: jax.Array,  # (N,)
    u_mesh_seq: jax.Array,  # (K, H, M) external mesh-field sequences
    e_op_t: jax.Array,  # (M, M) == grid.e_op.T
    *,
    n_mesh: int,
    length: float,
    dt: float,
    n0: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """K candidate H-step staggered-KDK rollouts, p = 128//M candidates packed
    per lane row; returns (K, H) per-step field energy ``0.5*sum(E_self^2)*dx``
    (same contract as :func:`fused_kdk_horizon`; trajectories match explicit
    KDK up to fp reassociation of the merged half-kicks)."""
    (n,) = x.shape
    k, h, m = u_mesh_seq.shape
    assert m == n_mesh and n_mesh <= 128
    p = 128 // n_mesh
    kp = _round_up(k, p * _BB)
    n_pad = _round_up(n, 128)
    if n_pad != n:
        x = jnp.pad(x, (0, n_pad - n))
        v = jnp.pad(v, (0, n_pad - n))
    if kp != k:
        u_mesh_seq = jnp.pad(u_mesh_seq, ((0, kp - k), (0, 0), (0, 0)))
    kk = kp // p
    # lane-pack members: candidate i*p + c -> row i, lanes [c*M, (c+1)*M)
    u_pack = jnp.transpose(u_mesh_seq.reshape(kk, p, h, m), (0, 2, 1, 3)).reshape(kk, h, p * m)
    if p * m != 128:
        u_pack = jnp.pad(u_pack, ((0, 0), (0, 0), (0, 128 - p * m)))
    eop = jnp.zeros((128, 128), jnp.float32)
    for c in range(p):
        eop = eop.at[c * m:(c + 1) * m, c * m:(c + 1) * m].set(e_op_t.astype(jnp.float32))
    norm = n0 * length / n / (length / n_mesh)

    kernel = functools.partial(
        _packed_kernel,
        p=p, n_mesh=n_mesh, n_valid=n, n_pad=n_pad,
        length=float(length), dt=float(dt), norm=float(norm),
        n0=float(n0), horizon=h,
    )
    f32 = jnp.float32
    pe2 = pl.pallas_call(
        kernel,
        grid=(kk // _BB,),
        in_specs=[
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BB, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kk, h, 128), f32),
        scratch_shapes=[
            pltpu.VMEM((_BB, p, n_pad), f32),
            pltpu.VMEM((_BB, p, n_pad), f32),
            pltpu.VMEM((_BB, n_pad, 128), f32),
        ],
        interpret=interpret,
    )(
        x.astype(f32)[None],
        v.astype(f32)[None],
        u_pack.astype(f32),
        eop,
    )
    # unpack: (KK, H, 128) -> per-member PE -> (K, H)
    pe = pe2[:, :, : p * m].reshape(kk, h, p, m).sum(-1)
    return jnp.transpose(pe, (0, 2, 1)).reshape(kp, h)[:k]


def fused_leapfrog_step(
    x: jax.Array,
    v: jax.Array,
    e_ext: jax.Array,
    e_op_t: jax.Array,
    *,
    n_mesh: int,
    length: float,
    dt: float,
    n0: float = 1.0,
    exact: bool = True,
    interpret: bool = False,
):
    """One leapfrog planning step, fully fused. Returns ``(x', v', E_post)``.

    ``x``/``v`` may be (N,) or (B, N); ``e_ext`` (M,) or (B, M). Extra leading
    axes introduced by ``jax.vmap`` reroute to the natively batched kernel
    (same pattern as :mod:`.cic_pallas`). ``E_post`` is the post-step
    self-consistent mesh field when ``exact`` else the kick-stage field.
    """
    n_valid = x.shape[-1]
    if x.ndim == 2:
        if e_ext.ndim == 1:
            e_ext = jnp.broadcast_to(e_ext, (x.shape[0],) + e_ext.shape)
        return _fused_impl(
            x, v, e_ext, e_op_t,
            n_mesh=n_mesh, length=length, dt=dt, n_valid=n_valid, n0=n0,
            exact=exact, interpret=interpret,
        )
    op = _fused_op(n_mesh, length, dt, n_valid, n0, exact, interpret)
    return op(x, v, e_ext, e_op_t)
