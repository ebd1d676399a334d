"""In-place cell-scatter kernel for the recency-buffer push (Pallas TPU).

The dense push plan writes up to E2 (= 2 * batch) individual ``(row, col)``
cells into each of the three ``(N1, B)`` int32 ring buffers. XLA lowers those
scatters as ~65 ns-per-element serialized updates (~26 us per buffer per step
at wiki shapes — 3 of them are ~12% of the 313k-edges/s TGN step). This
kernel applies the same writes inside VMEM with the buffer aliased in-place:
one whole-buffer HBM→VMEM→HBM round trip (~12 us at 4.7 MB) plus a scalar
update loop.

Semantics match ``buf.at[rows, cols].set(vals, mode="drop")`` followed by the
dump-row reset, PROVIDED each valid (row, col) target is written at most once
— which the push plan guarantees (each kept event owns a distinct slot).
Writes aimed at rows >= num_rows-1 (the dump row and out-of-range ids) are
skipped instead of written-then-reset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, cols_ref, vals_ref, buf_ref, out_ref, *, last_live_row):
    # Aliased in/out: out_ref starts as a copy of buf_ref's block.
    out_ref[...] = buf_ref[...]
    E = rows_ref.shape[0]
    B = buf_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    def body(i, _):
        r = rows_ref[i]
        c = cols_ref[i]

        @pl.when(r <= last_live_row)
        def _():
            # Mosaic has no scalar VMEM store: read-modify-write the (1, B)
            # row with a lane mask instead. Events hitting the same row in
            # different columns are safe — the loop serializes them.
            row = out_ref[pl.ds(r, 1), :]
            out_ref[pl.ds(r, 1), :] = jnp.where(lane == c, vals_ref[i], row)

        return 0

    jax.lax.fori_loop(0, E, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_cells(
    buf: jnp.ndarray,  # (N1, B) int32; LAST row is the dump row
    rows: jnp.ndarray,  # (E,) int32 target rows (dump row = skip)
    cols: jnp.ndarray,  # (E,) int32 target columns
    vals: jnp.ndarray,  # (E,) int32 values
    interpret: bool = False,
) -> jnp.ndarray:
    """Return ``buf`` with ``buf[rows[i], cols[i]] = vals[i]`` applied in
    place (dump-row/invalid targets skipped; each live target written once)."""
    N1 = buf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # rows, cols, vals live in SMEM
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, last_live_row=N1 - 2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(rows, cols, vals, buf)


def _store1d_kernel(rows_s_ref, oth_s_ref, t_s_ref, rows_d_ref, oth_d_ref,
                    t_d_ref, so_ref, st_ref, do_ref, dt_ref,
                    oso_ref, ost_ref, odo_ref, odt_ref, *, last_live_row):
    """Fused RMW of the four int32 1-D TGN message stores, viewed (M, 128).

    Target element r lives at (r // 128, r % 128); writes aimed past
    ``last_live_row`` (the dump row and out-of-range ids) are skipped.
    """
    oso_ref[...] = so_ref[...]
    ost_ref[...] = st_ref[...]
    odo_ref[...] = do_ref[...]
    odt_ref[...] = dt_ref[...]
    E = rows_s_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def write(out_a, out_b, r, va, vb):
        @pl.when(r <= last_live_row)
        def _():
            blk, c = r // 128, r % 128
            row_a = out_a[pl.ds(blk, 1), :]
            out_a[pl.ds(blk, 1), :] = jnp.where(lane == c, va, row_a)
            row_b = out_b[pl.ds(blk, 1), :]
            out_b[pl.ds(blk, 1), :] = jnp.where(lane == c, vb, row_b)

    def body(i, _):
        write(oso_ref, ost_ref, rows_s_ref[i], oth_s_ref[i], t_s_ref[i])
        write(odo_ref, odt_ref, rows_d_ref[i], oth_d_ref[i], t_d_ref[i])
        return 0

    jax.lax.fori_loop(0, E, body, 0)


@functools.partial(jax.jit, static_argnames=("last_live_row", "interpret"))
def tgn_store_scatter_1d(
    s_other: jnp.ndarray,  # (N1,) int32, N1 % 128 == 0
    s_t: jnp.ndarray,
    d_other: jnp.ndarray,
    d_t: jnp.ndarray,
    rows_s: jnp.ndarray,  # (E,) winner rows (dump row = skip)
    vals_s_other: jnp.ndarray,  # (E,)
    vals_s_t: jnp.ndarray,
    rows_d: jnp.ndarray,
    vals_d_other: jnp.ndarray,
    vals_d_t: jnp.ndarray,
    last_live_row: int,
    interpret: bool = False,
):
    """Apply the six 1-D last-aggregator store writes' int32 part in one
    kernel: ``x.at[rows].set(vals)`` for (s_other, s_t) at rows_s and
    (d_other, d_t) at rows_d, dump-row targets skipped. The four buffers
    round-trip HBM->VMEM->HBM once (~37 KB each) instead of four XLA
    scatters serializing ~65 ns/element."""
    N1 = s_other.shape[0]
    assert N1 % 128 == 0, N1
    M = N1 // 128
    as2d = lambda a: a.reshape(M, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
    )
    outs = pl.pallas_call(
        functools.partial(_store1d_kernel, last_live_row=last_live_row),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((M, 128), jnp.int32)] * 4,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
    )(rows_s, vals_s_other, vals_s_t, rows_d, vals_d_other, vals_d_t,
      as2d(s_other), as2d(s_t), as2d(d_other), as2d(d_t))
    return tuple(o.reshape(N1) for o in outs)
