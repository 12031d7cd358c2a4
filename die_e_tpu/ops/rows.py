"""Pallas TPU kernel: per-game row gather from the search tree's prior store.

The hottest tree-addressing op is reading node ``cur[b]``'s action-row out
of the [B, N, ...] prior array at every selection level.  XLA's options are
bad on this hardware: a dynamic gather costs milliseconds (measured ~3.5 ms
at B=1024) and the masked one-hot reduction — the fallback — reads the
ENTIRE array (O(B*N*A) HBM traffic) to extract O(B*A) bytes.

This kernel uses ``PrefetchScalarGridSpec``: the per-game node indices are
scalar-prefetched into SMEM before the body runs, and each grid step issues
direct HBM->HBM row DMAs for its 8-game group — O(B*A) traffic, the
speed-of-light for this access pattern, and its cost is INDEPENDENT of the
node capacity N (the reduction scales linearly with N).  Measured at
B=1024, N=101: 0.82 ms vs 1.92 ms for the same-shape masked reduction.

Mosaic tiling rules shape the layout: DMA slice shapes must keep the last
two dims (sublane, lane) aligned to (8, 128), so the prior is stored as
``[B, N, R, 128]`` with the action axis padded to ``R*128`` (R a multiple
of 8) — see ``pad_actions``.  Slicing the two untiled leading dims by 1 is
then legal.  Falls back to the masked reduction on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128
SUBLANE = 8
_TILE = 8  # games per grid step


def pad_actions(a: int) -> int:
    """Smallest padded action-axis size R*128 with R a multiple of 8."""
    unit = LANE * SUBLANE
    return ((a + unit - 1) // unit) * unit


@functools.cache
def pallas_available() -> bool:
    """True when a TPU backend is the default (the kernel requires Mosaic)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _gather_rows_pallas(src, idx):
    """src [B, N, R, 128], idx [B] -> out [B, R, 128] = src[b, idx[b]]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, r, c = src.shape

    def kernel(idx_ref, src_ref, out_ref):
        def body(sems):
            g = pl.program_id(0)
            copies = []
            for j in range(_TILE):
                b_ = g * _TILE + j
                row = idx_ref[b_]
                copies.append(
                    pltpu.make_async_copy(
                        src_ref.at[b_, pl.ds(row, 1)],
                        out_ref.at[pl.ds(b_, 1)],
                        sems.at[j],
                    )
                )
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((_TILE,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // _TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, r, c), src.dtype),
        grid_spec=grid_spec,
    )(idx.astype(jnp.int32), src)


def _gather_rows_reduce(src, idx):
    """Masked-reduction fallback (fusable, no dynamic gather)."""
    n = src.shape[1]
    oh = idx[:, None] == jnp.arange(n)[None, :]
    ohx = oh.reshape(oh.shape + (1,) * (src.ndim - 2))
    zero = jnp.zeros((), src.dtype)
    return jnp.sum(jnp.where(ohx, src, zero), axis=1)


def gather_rows(src, idx):
    """out[b] = src[b, idx[b]] for a [B, N, R, 128] padded prior store.

    Pallas DMA kernel on TPU (B divisible by 8), masked reduction elsewhere.
    """
    if pallas_available() and src.shape[0] % _TILE == 0:
        return _gather_rows_pallas(src, idx)
    return _gather_rows_reduce(src, idx)


def _scatter_rows_pallas(dst, idx, rows, mask):
    """dst[b, idx[b]] = rows[b] where mask[b]; in place via aliasing.

    The write-side twin of the gather: per-row HBM DMAs instead of a full
    [B, N, R, 128] where-select (whose read+write traffic scales with N).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, r, c = dst.shape

    def kernel(idx_ref, mask_ref, rows_ref, dst_ref, out_ref):
        del dst_ref  # aliased with out_ref
        def body(sems):
            g = pl.program_id(0)
            for j in range(_TILE):
                b_ = g * _TILE + j

                @pl.when(mask_ref[b_] != 0)
                def _():
                    row = idx_ref[b_]
                    cp = pltpu.make_async_copy(
                        rows_ref.at[pl.ds(b_, 1)],
                        out_ref.at[b_, pl.ds(row, 1)],
                        sems.at[j],
                    )
                    cp.start()
                    cp.wait()

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((_TILE,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // _TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(dst.shape, dst.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # dst buffer reused as output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx.astype(jnp.int32), mask.astype(jnp.int32), rows, dst)


def _scatter_rows_where(dst, idx, rows, mask):
    n = dst.shape[1]
    oh = idx[:, None] == jnp.arange(n)[None, :]
    sel = oh & mask[:, None]
    return jnp.where(sel[:, :, None, None], rows[:, None, :, :], dst)


def scatter_rows(dst, idx, rows, mask):
    """dst[b, idx[b]] = rows[b] where mask[b], for [B, N, R, 128] stores."""
    if pallas_available() and dst.shape[0] % _TILE == 0:
        return _scatter_rows_pallas(dst, idx, rows, mask)
    return _scatter_rows_where(dst, idx, rows, mask)
