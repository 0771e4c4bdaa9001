"""Pallas TPU kernels for the region-membership hot ops.

These are the TPU-native equivalents of the reference's C neighbor kernels
(``clustering/cneighbors.c``): ``count_within_distance_of`` (:95-119) and
``bootstrapped_maxdistance`` (:125-179). The XLA matmul formulations in
``ns/region.py`` are already MXU-bound; these kernels fuse the distance
computation with the compare/reduce so the [N, M] distance matrix never
round-trips through HBM — relevant when member sets and proposal batches are
scaled up (large-D production runs).

Both kernels are TILED over the member axis (VMEM is ~16 MB/core, so the
full [M, M] distance matrix of a large member set must never be resident):
each grid step computes one [T_rows, T_cols] distance tile on the MXU and
folds it into small accumulators, so ``member_capacity`` is bounded by HBM,
not VMEM.

Selected via ``MDT_REGION_BACKEND`` (auto/jnp/pallas, resolved in
``ns/region.py``): ``auto`` uses these kernels on TPU; the jnp forms remain
the CPU path and the reference for equivalence tests
(``tools/pallas_tpu_check.py`` records compiled on-device agreement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_POS_BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sq_dist_tile(a, b):
    """[Ta, Tb] squared euclidean distances on the MXU
    (|a|^2 - 2 a.b + |b|^2; HIGHEST matches region.pairwise_sqdist)."""
    cross = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ssa = jnp.sum(jnp.square(a), axis=1, keepdims=True)
    ssb = jnp.sum(jnp.square(b), axis=1, keepdims=True)
    return jnp.maximum(ssa - 2.0 * cross + ssb.T, 0.0)


def _count_kernel(pts_ref, mem_ref, memmask_ref, r2_ref, out_ref):
    """One [TN, TM] tile: count members within radius, accumulated over the
    member-tile grid axis (cneighbors.c:95-119 semantics: strict <)."""
    j = pl.program_id(1)
    d2 = _sq_dist_tile(pts_ref[:], mem_ref[:])          # [TN, TM]
    near = (d2 < r2_ref[0]) & (memmask_ref[:].T > 0)
    partial = jnp.sum(near.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += partial


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_within_pallas(members, member_mask, points, radius,
                        interpret: bool = False):
    """Number of member balls containing each point: [N] int32.

    Tiled over both the point axis (TN rows) and the member axis (TM
    columns); the member grid axis is innermost, so each point tile's
    count accumulates in VMEM across member tiles.
    """
    N, ndim = points.shape
    M = members.shape[0]
    TN = min(_round_up(N, 8), 512)
    TM = min(_round_up(M, 128), 1024)
    Np = _round_up(N, TN)
    Mp = _round_up(M, TM)
    pts = jnp.zeros((Np, ndim), jnp.float32).at[:N].set(points)
    # padded proposals land on the origin; mask handles members (padded
    # member rows get mask 0), and the caller slices the output back to N
    mem = jnp.zeros((Mp, ndim), jnp.float32).at[:M].set(members)
    mask_f = jnp.zeros((Mp, 1), jnp.float32).at[:M, 0].set(
        member_mask.astype(jnp.float32))
    r2 = jnp.square(radius).reshape(1)

    out = pl.pallas_call(
        _count_kernel,
        grid=(Np // TN, Mp // TM),
        in_specs=[
            pl.BlockSpec((TN, ndim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, ndim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
    interpret=interpret,
    )(pts, mem, mask_f, r2)
    return out[:N, 0]


def _radius_kernel(w_rows_ref, w_cols_ref, inbag_rows_ref, inbag_cols_ref,
                   mask_rows_ref, out_ref, nearest_ref):
    """Bootstrapped-radius reduction over one [TR, TC] distance tile.

    Grid = (row_tiles, col_tiles), cols innermost. ``nearest_ref`` scratch
    [nb, TR] carries, for every bootstrap round, each row point's min
    distance to an in-bag member, folded across column tiles. At the last
    column tile each round reduces max-over-out-of-bag rows and the global
    max lands in ``out_ref`` (cneighbors.c:125-179 semantics). Rounds
    unroll statically (nb ~ 10) over VPU ops on the shared tile.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    ncols = pl.num_programs(1)
    nb = inbag_rows_ref.shape[0]

    @pl.when(j == 0)
    def _():
        nearest_ref[:] = jnp.full_like(nearest_ref, _POS_BIG)

    d2 = _sq_dist_tile(w_rows_ref[:], w_cols_ref[:])    # [TR, TC]
    for b in range(nb):
        inbag_c = inbag_cols_ref[b, :] > 0              # [TC]
        masked = jnp.where(inbag_c[None, :], d2, _POS_BIG)
        tile_min = jnp.min(masked, axis=1)              # [TR]
        nearest_ref[b, :] = jnp.minimum(nearest_ref[b, :], tile_min)

    @pl.when(j == ncols - 1)
    def _():
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = 0.0

        valid = mask_rows_ref[0, :] > 0                 # [TR]
        acc = out_ref[0, 0]
        for b in range(nb):
            oob = valid & ~(inbag_rows_ref[b, :] > 0)
            nearest = nearest_ref[b, :]
            # a round with an empty bag contributes nothing: its "nearest"
            # stays at +BIG but oob rows are then ALL rows; guard like the
            # jnp path by zeroing non-oob and capping empty-bag rounds
            rmax = jnp.max(jnp.where(oob, nearest, 0.0))
            acc = jnp.maximum(acc, jnp.where(rmax >= _POS_BIG, 0.0, rmax))
        out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def bootstrapped_sq_radius_pallas(w, member_mask, inbag_rounds,
                                  interpret: bool = False):
    """Squared RadFriends radius from precomputed in-bag masks
    [nb, M] -> scalar (max over rounds), tiled over the member axis."""
    nb, M = inbag_rounds.shape
    ndim = w.shape[1]
    TR = min(_round_up(M, 8), 256)
    TC = min(_round_up(M, 128), 1024)
    Mr = _round_up(M, TR)
    Mc = _round_up(M, TC)
    Mp = max(Mr, Mc)
    wp = jnp.zeros((Mp, ndim), jnp.float32).at[:M].set(w)
    # padded rows: mask 0 (never out-of-bag); padded cols: inbag 0 (never
    # a neighbor candidate)
    mask_f = jnp.zeros((1, Mp), jnp.float32).at[0, :M].set(
        member_mask.astype(jnp.float32))
    inbag_f = jnp.zeros((nb, Mp), jnp.float32).at[:, :M].set(
        inbag_rounds.astype(jnp.float32))

    out = pl.pallas_call(
        _radius_kernel,
        grid=(Mp // TR, Mp // TC),
        in_specs=[
            pl.BlockSpec((TR, ndim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, ndim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, TR), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb, TR), jnp.float32)],
        interpret=interpret,
    )(wp, wp, inbag_f, inbag_f, mask_f)
    return out[0, 0]
