"""Fused popcount-Hamming + top-2 matching kernel for binary descriptors.

The ORB-class path (implicit native component N2/N3, SURVEY.md §2.2) packs
256-bit BRIEF descriptors into 8 uint32 words; matching needs the [N1, N2]
Hamming matrix (XOR + popcount over the word axis) and its row-wise top-2
for the ratio test.  The XLA reference form (`ops/matching.py:
hamming_distance_matrix`) materializes the [N1, N2, W] XOR tensor and the
[N1, N2] distance matrix in HBM; at production sizes that round-trip is the
whole cost — the arithmetic is a handful of VPU integer ops per element.

This kernel streams train tiles through VMEM and keeps a running
(best, second-best, argbest) per query row in scratch, so neither the XOR
tensor nor the distance matrix ever exists.  Popcount is shift/add SWAR
(no 32-bit multiply — widest ops Mosaic lowers everywhere).  Same layout
contract as ``matching_kernel.fused_l2_top2``: grid = (query tiles, train
tiles), train fastest, carry in VMEM scratch, flush on the last train tile.

Train descriptors are consumed TRANSPOSED ([W, N2]) so per-word rows are
natural row slices ([1, TT]) — no in-kernel relayout.
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


def _popcount_u32(x: Array) -> Array:
    """SWAR popcount of uint32 lanes using only shifts/adds/ands (the
    multiply-free variant of the classic bit trick — int32 multiplies are
    the one SWAR op worth avoiding on the VPU)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    x = x + (x >> 8)
    x = x + (x >> 16)
    return (x & jnp.uint32(0x3F)).astype(jnp.int32)


def _hamming_top2_kernel(q_ref, tT_ref, bias_ref, d_out, i_out,
                         best1, best2, idx1, idx2):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    w_words = q_ref.shape[1]
    tt = tT_ref.shape[1]
    tq = q_ref.shape[0]

    # Hamming tile: Σ_w popcount(q_w ⊕ t_w), built by broadcasting the
    # [TQ, 1] query word column against the [1, TT] train word row.
    acc = jnp.zeros((tq, tt), jnp.int32)
    for w in range(w_words):  # static: W = descriptor_bits / 32 (8 for ORB)
        x = jnp.bitwise_xor(q_ref[:, w : w + 1], tT_ref[w : w + 1, :])
        acc = acc + _popcount_u32(x)
    d = acc.astype(jnp.float32) + bias_ref[:]  # invalid train cols → +BIG

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    m1 = jnp.min(d, axis=1, keepdims=True)                   # [TQ, 1]
    i1_local = jnp.min(jnp.where(d <= m1, col, tt), axis=1, keepdims=True)
    masked = jnp.where(col == i1_local, _BIG, d)
    m2 = jnp.min(masked, axis=1, keepdims=True)
    i2_local = jnp.min(jnp.where(masked <= m2, col, tt), axis=1, keepdims=True)
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
        best1[:] = jnp.minimum(b1, m1)
        idx1[:] = jnp.where(m1 < b1, g1, ix)
        # runner-up: best of (loser of the b1/m1 duel, min(b2, m2)) — values
        # and indices updated in lockstep so i_out[:, 1] is the true 2-NN.
        loser_v = jnp.maximum(b1, m1)
        loser_i = jnp.where(m1 < b1, ix, g1)
        cand_v = jnp.minimum(b2, m2)
        cand_i = jnp.where(m2 < b2, g2, ix2)
        best2[:] = jnp.minimum(loser_v, cand_v)
        idx2[:] = jnp.where(loser_v < cand_v, loser_i, cand_i)

    @pl.when(j == nj - 1)
    def _():
        d_out[:, 0:1] = best1[:]
        d_out[:, 1:2] = best2[:]
        i_out[:, 0:1] = idx1[:]
        i_out[:, 1:2] = idx2[:]


def _pad_to(x: Array, n: int, axis: int, value=0) -> Array:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t", "interpret"))
def fused_hamming_top2(
    q_bits: Array,
    t_bits: Array,
    t_mask: Array,
    tile_q: int = 256,
    tile_t: int = 512,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Row-wise (best, second-best) Hamming distances + best index.

    Args:
      q_bits: [N1, W] uint32 packed query descriptors.
      t_bits: [N2, W] uint32 packed train descriptors.
      t_mask: [N2] bool — invalid train rows are excluded (+inf).

    Returns:
      (dist [N1, 2] float32 Hamming counts — column 1 is the runner-up for
      the ratio test; idx [N1, 2] int32 — column 0 is the 1-NN index,
      column 1 the 2-NN index).  Matches ``knn_match(..., k=2,
      metric='hamming')`` semantics for valid rows; caller applies
      query-side masking.
    """
    n1, w = q_bits.shape
    n2 = t_bits.shape[0]
    n1p = -(-n1 // tile_q) * tile_q
    n2p = -(-n2 // tile_t) * tile_t

    qp = _pad_to(q_bits.astype(jnp.uint32), n1p, 0)
    tT = _pad_to(t_bits.astype(jnp.uint32), n2p, 0).T  # [W, N2p]
    valid = _pad_to(t_mask.astype(jnp.float32), n2p, 0)
    bias = jnp.where(valid > 0, 0.0, _BIG)[None, :]  # [1, N2p]

    grid = (n1p // tile_q, n2p // tile_t)
    dist, idx = pl.pallas_call(
        _hamming_top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_t), lambda i, j: (0, j),
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
            # ~18 integer VPU ops per (row, col, word) cell
            flops=18 * n1p * n2p * w,
            bytes_accessed=4 * (n1p * w + grid[0] * n2p * w + n1p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, tT, bias)
    return dist[:n1], idx[:n1]
