"""Pallas TPU kernels for the region-membership hot ops.

These are the TPU-native equivalents of the reference's C neighbor kernels
(``clustering/cneighbors.c``): ``count_within_distance_of`` (:95-119) and
``bootstrapped_maxdistance`` (:125-179). The XLA matmul formulations in
``ns/region.py`` are already MXU-bound; these kernels fuse the distance
computation with the compare/reduce so the [N, M] distance matrix never
round-trips through HBM — relevant when member sets and proposal batches are
scaled up (large-D production runs).

Selected via ``MDT_REGION_BACKEND`` (auto/jnp/pallas, resolved in
``ns/region.py``): ``auto`` uses these kernels on TPU; the jnp forms remain
the CPU path and the reference for equivalence tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _count_kernel(pts_ref, mem_ref, memmask_ref, r2_ref, out_ref):
    """One tile of proposals vs the full member set.

    dist2 = |p|^2 - 2 p.m + |m|^2 computed on the MXU; the compare+sum
    reduction happens in VMEM (cneighbors.c:95-119 semantics: strict <).
    """
    pts = pts_ref[:]            # [Tn, ndim]
    mem = mem_ref[:]            # [M, ndim]
    cross = jax.lax.dot_general(
        pts, mem,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # match region.pairwise_sqdist
    )  # [Tn, M]
    ssp = jnp.sum(jnp.square(pts), axis=1, keepdims=True)
    ssm = jnp.sum(jnp.square(mem), axis=1, keepdims=True)
    d2 = jnp.maximum(ssp - 2.0 * cross + ssm.T, 0.0)
    near = (d2 < r2_ref[0]) & (memmask_ref[:].T > 0)
    out_ref[:] = jnp.sum(near.astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_within_pallas(members, member_mask, points, radius,
                        interpret: bool = False):
    """Number of member balls containing each point: [N] int32."""
    N, ndim = points.shape
    M = members.shape[0]
    TN = min(_round_up(N, 8), 512)
    Np = _round_up(N, TN)
    pts = jnp.zeros((Np, ndim), jnp.float32).at[:N].set(points)
    # padded proposals land on the origin; mask handles members, and the
    # caller slices the output back to N so padded rows are irrelevant
    mask_f = member_mask.astype(jnp.float32).reshape(M, 1)
    r2 = jnp.square(radius).reshape(1)

    out = pl.pallas_call(
        _count_kernel,
        grid=(Np // TN,),
        in_specs=[
            pl.BlockSpec((TN, ndim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, ndim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TN, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        interpret=interpret,
    )(pts, members, mask_f, r2)
    return out[:N, 0]


def _radius_kernel(w_ref, mask_ref, inbag_ref, out_ref):
    """All bootstrap rounds in one invocation: the [M, M] distance matrix is
    computed once on the MXU and stays in VMEM; each round reduces
    max-over-out-of-bag of min-over-in-bag (cneighbors.c:125-179). Rounds
    unroll statically (nb ~ 10), so rows are indexed with constants — the
    Mosaic lowering forbids (1, M) blocks over a [nb, M] array when nb is
    not a multiple of 8."""
    w = w_ref[:]                      # [M, ndim]
    cross = jax.lax.dot_general(
        w, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # match region.pairwise_sqdist
    )
    ss = jnp.sum(jnp.square(w), axis=1, keepdims=True)
    d2 = jnp.maximum(ss - 2.0 * cross + ss.T, 0.0)  # [M, M]
    valid = mask_ref[0, :] > 0        # [M]
    big = jnp.float32(1e30)
    acc = jnp.float32(0.0)
    for b in range(inbag_ref.shape[0]):
        inbag = inbag_ref[b, :] > 0   # [M]
        nearest = jnp.min(jnp.where(inbag[None, :], d2, big), axis=1)
        oob = valid & ~inbag
        rmax = jnp.max(jnp.where(oob, nearest, 0.0))
        acc = jnp.maximum(acc, jnp.where(jnp.any(inbag), rmax, 0.0))
    out_ref[:, :] = jnp.full((1, 1), acc, jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bootstrapped_sq_radius_pallas(w, member_mask, inbag_rounds,
                                  interpret: bool = False):
    """Squared RadFriends radius from precomputed in-bag masks
    [nb, M] -> scalar (max over rounds)."""
    nb, M = inbag_rounds.shape
    mask_f = member_mask.astype(jnp.float32).reshape(1, M)
    inbag_f = inbag_rounds.astype(jnp.float32)

    out = pl.pallas_call(
        _radius_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(w, mask_f, inbag_f)
    return out[0, 0]
