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


def _top2_kernel(q_ref, t_ref, t2_ref, d_out, i_out,
                 best1, best2, idx1, idx2, *, gemm_dtype):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    q = q_ref[:]                      # [TQ, D]
    t = t_ref[:]                      # [TT, D]
    # ‖q−t‖² = ‖q‖² + ‖t‖² − 2⟨q,t⟩; ‖q‖² is constant per row and does not
    # change the top-2 order, so it is added once at flush time — the tile
    # only needs ‖t‖² and the GEMM.  gemm_dtype='bf16' feeds the MXU its
    # native operand width (f32 accumulation via preferred_element_type),
    # matching the XLA path's compute_dtype semantics.
    # compute_dtype='f32' must mean f32: at DEFAULT precision the TPU
    # truncates f32 GEMM operands to bf16, silently giving the bf16 path
    # (core/precision.py).  bf16 operands are single-pass either way.
    d = t2_ref[:] - 2.0 * jax.lax.dot_general(
        q.astype(gemm_dtype), t.astype(gemm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST
                   if gemm_dtype == jnp.float32 else
                   jax.lax.Precision.DEFAULT),
    )                                  # [TQ, TT]

    tt = d.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    m1 = jnp.min(d, axis=1, keepdims=True)                     # [TQ, 1]
    is_min = d <= m1
    # first column index attaining the min
    i1_local = jnp.min(jnp.where(is_min, col, tt), axis=1, keepdims=True)
    masked = jnp.where(col == i1_local, _BIG, d)
    m2 = jnp.min(masked, axis=1, keepdims=True)
    is_min2 = masked <= m2
    i2_local = jnp.min(jnp.where(is_min2, col, tt), axis=1, keepdims=True)
    g1 = (j * tt + i1_local).astype(jnp.int32)
    g2 = (j * tt + i2_local).astype(jnp.int32)

    @pl.when(j == 0)
    def _():
        best1[:] = m1
        best2[:] = m2
        idx1[:] = g1
        idx2[:] = g2

    @pl.when(j > 0)
    def _():
        b1 = best1[:]
        b2 = best2[:]
        ix = idx1[:]
        ix2 = idx2[:]
        new_b1 = jnp.minimum(b1, m1)
        new_ix = jnp.where(m1 < b1, g1, ix)
        # runner-up: best of (loser of the b1/m1 duel, min(b2, m2)) — track
        # values and indices in lockstep so i_out[:, 1] is the true 2-NN.
        loser_v = jnp.maximum(b1, m1)
        loser_i = jnp.where(m1 < b1, ix, g1)
        cand_v = jnp.minimum(b2, m2)
        cand_i = jnp.where(m2 < b2, g2, ix2)
        new_b2 = jnp.minimum(loser_v, cand_v)
        new_i2 = jnp.where(loser_v < cand_v, loser_i, cand_i)
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
