"""Pallas TPU kernels: fused CIC deposition and field gather.

The hot ops of the PIC step are O(B*N*M) dense shape-function evaluations
(see :mod:`plasma_control_tpu.ops.deposit`). The XLA path materializes the
(B, N, M) weight tensor in HBM for the gather matmul; these kernels instead
build each (BB, BN, M) weight tile in VMEM, consume it immediately
(reduction for deposit, batched MXU matvec for gather), and never write it to
HBM — the "materialize-in-VMEM-only" pattern from the Pallas TPU guide.

Layout: grid = (B/BB, N/BN) with the particle-block axis minor, so the
deposit output block (BB, M) is revisited and accumulated across particle
tiles. Tiles are (BB=8, BN) to satisfy the (8, 128) TPU tiling constraint;
padded batch rows and particle rows are masked by global index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deposit_cic_pallas", "gather_cic_pallas"]

_BB = 8  # batch tile (sublane multiple)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_VMEM_TILE_BUDGET = 6 * 1024 * 1024  # bytes for the (8, BN, M) weight tile


def _auto_block_n(n: int, n_mesh: int) -> int:
    """Largest lane-aligned particle tile whose weight block fits the VMEM
    budget; bigger tiles amortize grid overhead (measured 4x on small mesh)."""
    limit = _VMEM_TILE_BUDGET // (_BB * n_mesh * 4)
    bn = min(_round_up(n, 128), max(128, (limit // 128) * 128))
    return bn


def _weights_tile(x_tile, n_mesh: int, dx: float, row0, n_valid: int, kind: str = "cic"):
    """(BB, BN, M) shape-function weights for one tile, padded rows zeroed.

    Same three kernels as :func:`plasma_control_tpu.ops.deposit.
    shape_weights_dense` as functions of the periodically wrapped cell-unit
    offset d: CIC hat, the reference's shifted TSC
    (`/root/reference/src/env/interpolate.py:28-32`), and textbook TSC.
    """
    from ..deposit import shape_weights_from_offset

    bb, bn = x_tile.shape
    pos = x_tile * (1.0 / dx)  # (BB, BN)
    j = jax.lax.broadcasted_iota(jnp.int32, (bb, bn, n_mesh), 2).astype(jnp.float32)
    d = pos[:, :, None] - j
    d = d - n_mesh * jnp.round(d * (1.0 / n_mesh))  # periodic wrap
    w = shape_weights_from_offset(d, kind)  # shared single-source formulas
    rows = jax.lax.broadcasted_iota(jnp.int32, (bb, bn, n_mesh), 1) + row0
    return jnp.where(rows < n_valid, w, 0.0)


def _deposit_kernel(x_ref, out_ref, *, n_mesh, dx, block_n, n_valid, kind):
    i_n = pl.program_id(1)
    w = _weights_tile(x_ref[:, :], n_mesh, dx, i_n * block_n, n_valid, kind)
    partial = jnp.sum(w, axis=1)  # (BB, M)

    @pl.when(i_n == 0)
    def _init():
        out_ref[:, :] = partial

    @pl.when(i_n > 0)
    def _acc():
        out_ref[:, :] = out_ref[:, :] + partial


def _gather_kernel(x_ref, e_ref, out_ref, *, n_mesh, dx, block_n, n_valid, kind):
    i_n = pl.program_id(1)
    w = _weights_tile(x_ref[:, :], n_mesh, dx, i_n * block_n, n_valid, kind)
    # batched (BB, BN, M) x (BB, M) -> (BB, BN) on the MXU, weights VMEM-only
    out_ref[:, :] = jax.lax.dot_general(
        w, e_ref[:, :],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _deposit_impl(
    x: jax.Array,  # (B, N) positions already wrapped to [0, L)
    n_mesh: int,
    length: float,
    block_n: int | None = None,
    interpret: bool = False,
    kind: str = "cic",
) -> jax.Array:
    b, n = x.shape
    if block_n is None:
        block_n = _auto_block_n(n, n_mesh)
    b_pad = _round_up(b, _BB)
    n_pad = _round_up(n, block_n)
    if (b_pad, n_pad) != (b, n):
        x = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n)))
    dx = length / n_mesh

    kernel = functools.partial(
        _deposit_kernel, n_mesh=n_mesh, dx=dx, block_n=block_n, n_valid=n, kind=kind
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // _BB, n_pad // block_n),
        in_specs=[pl.BlockSpec((_BB, block_n), lambda i, k: (i, k), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BB, n_mesh), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_mesh), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32))
    return out[:b]


def _gather_impl(
    e_mesh: jax.Array,  # (B, M)
    x: jax.Array,  # (B, N)
    n_mesh: int,
    length: float,
    block_n: int | None = None,
    interpret: bool = False,
    kind: str = "cic",
) -> jax.Array:
    b, n = x.shape
    if block_n is None:
        block_n = _auto_block_n(n, n_mesh)
    b_pad = _round_up(b, _BB)
    n_pad = _round_up(n, block_n)
    if (b_pad, n_pad) != (b, n):
        x = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n)))
        e_mesh = jnp.pad(e_mesh, ((0, b_pad - b), (0, 0)))
    dx = length / n_mesh

    kernel = functools.partial(
        _gather_kernel, n_mesh=n_mesh, dx=dx, block_n=block_n, n_valid=n, kind=kind
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // _BB, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((_BB, block_n), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, n_mesh), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BB, block_n), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), e_mesh.astype(jnp.float32))
    return out[:b, :n]


# ---------------------------------------------------------------------------
# Public wrappers with custom vmap rules.
#
# Under jax.vmap the default pallas batching rule serializes over the batch
# axis (measured ~8x slower end-to-end); these rules reroute a batched call to
# the natively batched (B, N) kernel, which tiles the batch into the (8, BN)
# sublane layout instead.
# ---------------------------------------------------------------------------

_VMAPPED_CACHE = {}


def _batched_ops(n_mesh: int, length: float, block_n, interpret: bool, kind: str = "cic"):
    key = (n_mesh, float(length), block_n, interpret, kind)
    if key in _VMAPPED_CACHE:
        return _VMAPPED_CACHE[key]

    kw = dict(n_mesh=n_mesh, length=length, block_n=block_n, interpret=interpret, kind=kind)

    @jax.custom_batching.custom_vmap
    def dep(x):
        return _deposit_impl(x[None], **kw)[0]

    @dep.def_vmap
    def _dep_rule(axis_size, in_batched, x):
        del axis_size
        (xb,) = in_batched
        assert xb, "deposit vmap rule requires the particle array batched"
        return _deposit_impl(x, **kw), True

    @jax.custom_batching.custom_vmap
    def gat(e_mesh, x):
        return _gather_impl(e_mesh[None], x[None], **kw)[0]

    @gat.def_vmap
    def _gat_rule(axis_size, in_batched, e_mesh, x):
        eb, xb = in_batched
        if not eb:
            e_mesh = jnp.broadcast_to(e_mesh, (axis_size,) + e_mesh.shape)
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        return _gather_impl(e_mesh, x, **kw), True

    _VMAPPED_CACHE[key] = (dep, gat)
    return dep, gat


def deposit_cic_pallas(x, n_mesh, length, block_n=None, interpret=False, kind="cic"):
    """Unnormalized density: sum of shape-function weights per cell.

    ``kind``: "cic" (default), "tsc" (reference-parity shifted kernel), or
    "tsc_standard". Accepts (N,) or (B, N); vmap over extra leading axes
    reroutes to the natively batched kernel.
    """
    dep, _ = _batched_ops(n_mesh, length, block_n, interpret, kind)
    if x.ndim == 2:
        return _deposit_impl(x, n_mesh=n_mesh, length=length, block_n=block_n, interpret=interpret, kind=kind)
    return dep(x)


def gather_cic_pallas(e_mesh, x, n_mesh, length, block_n=None, interpret=False, kind="cic"):
    """Per-particle interpolation of e_mesh at x; (N,) or (B, N)."""
    _, gat = _batched_ops(n_mesh, length, block_n, interpret, kind)
    if x.ndim == 2:
        if e_mesh.ndim == 1:
            e_mesh = jnp.broadcast_to(e_mesh, (x.shape[0],) + e_mesh.shape)
        return _gather_impl(e_mesh, x, n_mesh=n_mesh, length=length, block_n=block_n, interpret=interpret, kind=kind)
    return gat(e_mesh, x)
