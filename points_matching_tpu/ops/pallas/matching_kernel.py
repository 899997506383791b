"""Fused L2-distance + top-2 matching kernel.

The XLA path (``ops/matching.py``) materializes the [N1, N2] distance
matrix in HBM and runs ``lax.top_k`` twice over it — at production sizes
the matrix round-trip is the bandwidth cost.  This kernel streams train
tiles through VMEM, computes the distance tile as one MXU GEMM, and keeps a
running (best, second-best, argbest) per query row in VMEM scratch — the
[N1, N2] matrix never exists.  This is the roofline shape BASELINE
designates for matching ("MXU-bound descriptor GEMMs", reference call site
``Points Matching/main.cpp:44-46``).

Layout: grid = (query tiles, train tiles), train fastest; TPU grids execute
sequentially so the running top-2 carry lives in scratch across the train
dimension and flushes to the output on the last train tile.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _tile_dist(q, t, t2, gemm_dtype):
    """Distance tile t2 − 2⟨q,t⟩ (‖q‖² is per-row constant — added once
    at flush time; it does not change the top-2 order).

    gemm_dtype='bf16' feeds the MXU its native operand width (f32
    accumulation via preferred_element_type), matching the XLA path's
    compute_dtype semantics.  compute_dtype='f32' must mean f32: at
    DEFAULT precision the TPU truncates f32 GEMM operands to bf16,
    silently giving the bf16 path (core/precision.py).
    """
    return t2 - 2.0 * jax.lax.dot_general(
        q.astype(gemm_dtype), t.astype(gemm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST
                   if gemm_dtype == jnp.float32 else
                   jax.lax.Precision.DEFAULT),
    )


def _tile_top2(d, j):
    """Per-tile (m1, m2, g1, g2, i1_local): best / runner-up distance and
    GLOBAL column indices; ties resolve to the lowest column."""
    tt = d.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    m1 = jnp.min(d, axis=1, keepdims=True)                     # [TQ, 1]
    is_min = d <= m1
    i1_local = jnp.min(jnp.where(is_min, col, tt), axis=1, keepdims=True)
    masked = jnp.where(col == i1_local, _BIG, d)
    m2 = jnp.min(masked, axis=1, keepdims=True)
    is_min2 = masked <= m2
    i2_local = jnp.min(jnp.where(is_min2, col, tt), axis=1, keepdims=True)
    g1 = (j * tt + i1_local).astype(jnp.int32)
    g2 = (j * tt + i2_local).astype(jnp.int32)
    return m1, m2, g1, g2, i1_local


def _carry_duel(b1, b2, ix, ix2, m1, m2, g1, g2):
    """Merge the running (best, second) carry with a new tile's top-2.

    Runner-up = best of (loser of the b1/m1 duel, min(b2, m2)) — values
    and indices tracked in lockstep so idx[:, 1] is the true 2-NN.
    Returns (new_b1, new_b2, new_ix, new_i2, take1)."""
    take1 = m1 < b1
    new_b1 = jnp.minimum(b1, m1)
    new_ix = jnp.where(take1, g1, ix)
    loser_v = jnp.maximum(b1, m1)
    loser_i = jnp.where(take1, ix, g1)
    cand_v = jnp.minimum(b2, m2)
    cand_i = jnp.where(m2 < b2, g2, ix2)
    new_b2 = jnp.minimum(loser_v, cand_v)
    new_i2 = jnp.where(loser_v < cand_v, loser_i, cand_i)
    return new_b1, new_b2, new_ix, new_i2, take1


def _top2_kernel(q_ref, t_ref, t2_ref, d_out, i_out,
                 best1, best2, idx1, idx2, *, gemm_dtype):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    q = q_ref[:]                      # [TQ, D]
    d = _tile_dist(q, t_ref[:], t2_ref[:], gemm_dtype)         # [TQ, TT]
    m1, m2, g1, g2, _ = _tile_top2(d, j)

    @pl.when(j == 0)
    def _():
        best1[:] = m1
        best2[:] = m2
        idx1[:] = g1
        idx2[:] = g2

    @pl.when(j > 0)
    def _():
        new_b1, new_b2, new_ix, new_i2, _ = _carry_duel(
            best1[:], best2[:], idx1[:], idx2[:], m1, m2, g1, g2
        )
        best1[:] = new_b1
        best2[:] = new_b2
        idx1[:] = new_ix
        idx2[:] = new_i2

    @pl.when(j == nj - 1)
    def _():
        q2 = jnp.sum(q * q, axis=1, keepdims=True)
        d_out[:, 0:1] = jnp.maximum(best1[:] + q2, 0.0)
        d_out[:, 1:2] = jnp.maximum(best2[:] + q2, 0.0)
        i_out[:, 0:1] = idx1[:]
        i_out[:, 1:2] = idx2[:]


def _top2_points_kernel(q_ref, t_ref, t2_ref, tp_ref, d_out, i_out, p_out,
                        best1, best2, idx1, idx2, pts1, *, gemm_dtype):
    """`_top2_kernel` + fused best-match POINT output.

    The caller-side ``p2[train_idx]`` row gather runs element-at-a-time on
    the TPU scalar path (measured ~3.3 µs/pair of the 17 µs two-view step,
    r5 slice probe); here the best candidate's point rides along as a
    per-tile one-hot dot — onehot(i1_local) [TQ, TT] (exact in bf16)
    against a 3-term hi/lo bf16 split of the point columns (pixel coords
    must NOT be single-pass bf16: ~2 px truncation grid), carried across
    train tiles with the same duel as the index."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    q = q_ref[:]
    d = _tile_dist(q, t_ref[:], t2_ref[:], gemm_dtype)
    m1, m2, g1, g2, i1_local = _tile_top2(d, j)

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    onehot = (col == i1_local).astype(jnp.bfloat16)          # [TQ, TT]
    TP = tp_ref[:]                                           # [TT, Cp]
    bh = TP.astype(jnp.bfloat16)
    r1 = TP - bh.astype(jnp.float32)
    bl = r1.astype(jnp.bfloat16)
    bl2 = (r1 - bl.astype(jnp.float32)).astype(jnp.bfloat16)
    dotp = lambda b: jax.lax.dot_general(
        onehot, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    cand = dotp(bh) + dotp(bl) + dotp(bl2)                   # [TQ, Cp]

    @pl.when(j == 0)
    def _():
        best1[:] = m1
        best2[:] = m2
        idx1[:] = g1
        idx2[:] = g2
        pts1[:] = cand

    @pl.when(j > 0)
    def _():
        new_b1, new_b2, new_ix, new_i2, take1 = _carry_duel(
            best1[:], best2[:], idx1[:], idx2[:], m1, m2, g1, g2
        )
        best1[:] = new_b1
        best2[:] = new_b2
        idx1[:] = new_ix
        idx2[:] = new_i2
        pts1[:] = jnp.where(take1, cand, pts1[:])

    @pl.when(j == nj - 1)
    def _():
        q2 = jnp.sum(q * q, axis=1, keepdims=True)
        d_out[:, 0:1] = jnp.maximum(best1[:] + q2, 0.0)
        d_out[:, 1:2] = jnp.maximum(best2[:] + q2, 0.0)
        i_out[:, 0:1] = idx1[:]
        i_out[:, 1:2] = idx2[:]
        p_out[:] = pts1[:]


def _pad_to(x: Array, n: int, axis: int, value=0.0) -> Array:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


@functools.partial(jax.jit, static_argnames=(
    "tile_q", "tile_t", "interpret", "compute_dtype"))
def fused_l2_top2(
    q: Array,
    t: Array,
    t_mask: Array,
    tile_q: int = 512,
    tile_t: int = 512,
    interpret: bool = False,
    compute_dtype: str = "f32",
) -> Tuple[Array, Array]:
    """Squared-L2 (best, second-best) distances and best index per query row.

    Args:
      q: [N1, D] query descriptors; t: [N2, D] train descriptors.
      t_mask: [N2] — invalid train rows are excluded (treated as +inf).

    Returns:
      (dist [N1, 2] squared-L2 — column 1 is the runner-up for the ratio
      test, idx [N1, 2] int32 — column 0 is the 1-NN index, column 1 the
      2-NN index).

    Matches ``knn_match(..., k=2)`` semantics for valid rows.  The caller
    applies query-side masking.

    Tile default 512×512 from the r4 on-chip sweep
    (benchmarks/probe/match_variants.py): 2.92 µs/pair vs 4.11 (256×512),
    5.4 (256×256 / 128×512) at the 512-kp bench shape — at N=512 the whole
    problem is a single grid step with both operands and the distance tile
    VMEM-resident.  The same sweep's GEMM-only kernel variant measures the
    top-2 bookkeeping at ~59% of kernel time (4.12 vs 1.69 µs/pair).
    """
    n1, d = q.shape
    n2 = t.shape[0]
    n1p = -(-n1 // tile_q) * tile_q
    n2p = -(-n2 // tile_t) * tile_t

    qp = _pad_to(q, n1p, 0)
    tp = _pad_to(t, n2p, 0)
    t2 = jnp.sum(tp * tp, axis=-1)
    # invalid/padded train rows → huge ‖t‖² → never selected
    valid = _pad_to(t_mask.astype(jnp.float32), n2p, 0)
    t2 = jnp.where(valid > 0, t2, _BIG)[None, :]  # [1, N2p]

    grid = (n1p // tile_q, n2p // tile_t)
    gemm_dtype = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
    dist, idx = pl.pallas_call(
        functools.partial(_top2_kernel, gemm_dtype=gemm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1p, 2), jnp.float32),
            jax.ShapeDtypeStruct((n1p, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.int32),
            pltpu.VMEM((tile_q, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n1p * n2p * d,
            bytes_accessed=4 * (n1p * d + grid[0] * n2p * d + n1p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, tp, t2)
    return dist[:n1], idx[:n1]


@functools.partial(jax.jit, static_argnames=(
    "tile_q", "tile_t", "interpret", "compute_dtype"))
def fused_l2_top2_points(
    q: Array,
    t: Array,
    t_mask: Array,
    t_points: Array,
    tile_q: int = 512,
    tile_t: int = 512,
    interpret: bool = False,
    compute_dtype: str = "f32",
) -> Tuple[Array, Array, Array]:
    """``fused_l2_top2`` + the 1-NN train POINT per query row, fused.

    Args are as in ``fused_l2_top2`` plus ``t_points`` [N2, P] (P ≤ 8;
    typically xy pixel coordinates).  Returns (dist [N1, 2], idx [N1, 2],
    pts [N1, P]) with ``pts[i] == t_points[idx[i, 0]]`` exactly (3-term
    bf16-split one-hot dot — ≤2⁻²⁴-relative, i.e. f32 rounding).  Rows
    whose matches are invalid return the tile-0 fallback row, same as the
    caller-side ``clip``-indexed gather this replaces."""
    n1, d = q.shape
    n2 = t.shape[0]
    P = t_points.shape[1]
    n1p = -(-n1 // tile_q) * tile_q
    n2p = -(-n2 // tile_t) * tile_t

    qp = _pad_to(q, n1p, 0)
    tp = _pad_to(t, n2p, 0)
    tpts = _pad_to(t_points.astype(jnp.float32), n2p, 0)
    t2 = jnp.sum(tp * tp, axis=-1)
    valid = _pad_to(t_mask.astype(jnp.float32), n2p, 0)
    t2 = jnp.where(valid > 0, t2, _BIG)[None, :]

    grid = (n1p // tile_q, n2p // tile_t)
    gemm_dtype = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
    dist, idx, pts = pl.pallas_call(
        functools.partial(_top2_points_kernel, gemm_dtype=gemm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, P), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, P), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1p, 2), jnp.float32),
            jax.ShapeDtypeStruct((n1p, 2), jnp.int32),
            jax.ShapeDtypeStruct((n1p, P), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.int32),
            pltpu.VMEM((tile_q, 1), jnp.int32),
            pltpu.VMEM((tile_q, P), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n1p * n2p * (d + 3 * P),
            bytes_accessed=4 * (n1p * d + grid[0] * n2p * (d + P)
                                + n1p * (4 + P)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, tp, t2, tpts)
    return dist[:n1], idx[:n1], pts[:n1]
