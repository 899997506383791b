"""Fused RANSAC hypothesis scoring: Sampson gating + inlier counting.

SURVEY.md §7 stage 4 ("RANSAC inlier counting — hypotheses×points tile,
on-device argmax").  The XLA path (`geometry/ransac.py`) materializes the
[H, N] Sampson matrix and the [H, N] inlier mask in HBM before reducing to
per-hypothesis counts; this kernel tiles hypotheses × points through VMEM
and reduces in place, so only the [H] counts ever leave the chip.

The math is restructured for the MXU: the Fp1 rows (Fp1)₁,(Fp1)₂,(Fp1)₃
and the Fᵀp2 rows (Fᵀp2)₁,(Fᵀp2)₂ are five skinny [TH,3]×[3,TN] GEMMs
against homogeneous p1ᵀ/p2ᵀ (row-major and column-major vec(F) layouts are
both passed in so Fᵀ never needs a strided in-kernel slice); the residual
r = p2ᵀFp1 = (Fp1)₁·x₂ + (Fp1)₂·y₂ + (Fp1)₃ and the Sampson ratio are
elementwise VPU work fused in the same tile.  This keeps the f32
association order of the XLA reference form (`sampson_distance`) — an
outer-product-feature single-GEMM variant was measurably less accurate at
pixel scale (coordinate products up to ~4·10⁵ in f32 flipped ~1% of
near-threshold gates).

Replaces the hot inner loop of classical RANSAC (the reference has none —
``Points Matching/main.cpp:95-98`` calls findFundamentalMat once; batched
RANSAC is the BASELINE config-1 extension).
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


def _score_kernel(f_row_ref, f_col_ref, p1_ref, p2_ref, valid_ref,
                  counts_out, acc, *, tau2: float, eps: float, exact: bool):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    F9 = f_row_ref[:]          # [TH, 9]  row-major vec(F)
    Fc9 = f_col_ref[:]         # [TH, 9]  column-major vec(F) (= vec(Fᵀ))
    P1 = p1_ref[:]             # [3, TN]  homogeneous p1ᵀ
    P2 = p2_ref[:]             # [3, TN]  homogeneous p2ᵀ

    # Precision (r5 on-chip sweep, benchmarks/probe/score_variants.py):
    # the original HIGHEST dots were 8 of the kernel's 12 µs/pair — the
    # f32 emulation runs 6 MXU passes per dot.  exact=True spells out the
    # 3-pass split by hand (hi/lo bf16 decomposition of BOTH operands,
    # dropping only the lo·lo term, error ~2⁻³² relative — count parity
    # with the f32 XLA reference measured exact; Mosaic rejects
    # per-operand dot precision so this cannot be expressed as a
    # precision flag).  exact=False uses the MXU's native single-pass
    # bf16 path (~3× faster still): counts then jitter by a few
    # near-threshold gates (measured ≤4/512), which is immaterial for
    # CONSENSUS RANKING because the caller recomputes the winning
    # hypothesis's inlier mask exactly (geometry/ransac.py d_best) — the
    # r4 precision bug (69 vs 326 inliers) was an inexact final GATE,
    # which no mode of this kernel reintroduces.
    # precision pinned to DEFAULT explicitly: callers trace this kernel
    # under the ambient @f32_matmuls HIGHEST context, which would silently
    # re-impose 6-pass emulation in fast mode and is invalid on the bf16
    # operands of the manual split (Mosaic 'Bad lhs type').
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if exact:
        def dot3(A, B):
            ah = A.astype(jnp.bfloat16)
            al = (A - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = B.astype(jnp.bfloat16)
            bl = (B - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            return dot(ah, bh) + dot(ah, bl) + dot(al, bh)
    else:
        dot3 = dot
    a1 = dot3(F9[:, 0:3], P1)   # (Fp1)₁
    a2 = dot3(F9[:, 3:6], P1)   # (Fp1)₂
    a3 = dot3(F9[:, 6:9], P1)   # (Fp1)₃
    b1 = dot3(Fc9[:, 0:3], P2)  # (Fᵀp2)₁
    b2 = dot3(Fc9[:, 3:6], P2)  # (Fᵀp2)₂

    # r = p2ᵀ(Fp1): elementwise against the p2 rows (p2h[2] ≡ 1)
    r = a1 * P2[0:1, :] + a2 * P2[1:2, :] + a3
    denom = a1 * a1 + a2 * a2 + b1 * b1 + b2 * b2
    # multiply-compare form of d = r²/denom < τ² (no per-cell divide)
    ok = jnp.logical_and(
        r * r < tau2 * jnp.maximum(denom, eps), valid_ref[:] > 0
    )
    cnt = jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        acc[:] = cnt

    @pl.when(j > 0)
    def _():
        acc[:] = acc[:] + cnt

    @pl.when(j == nj - 1)
    def _():
        counts_out[:] = acc[:]


def _pad_to(x: Array, n: int, axis: int, value=0.0) -> Array:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("threshold", "tile_h", "tile_n", "interpret",
                              "exact")
)
def ransac_score_hypotheses(
    F_h: Array,
    p1: Array,
    p2: Array,
    mask: Array,
    threshold: float,
    tile_h: int = 512,   # r5 on-chip sweep (score_variants.py prod_th*):
    tile_n: int = 512,   # 2.99 µs/pair at 512 vs 3.27 at 128 — one grid
    interpret: bool = False,  # step holds all [TH, TN] intermediates in VMEM
    exact: bool = True,
) -> Array:
    """Per-hypothesis inlier counts under the Sampson gate — fused on-chip.

    Args:
      F_h:  [H, 3, 3] hypothesis fundamental matrices.
      p1:   [N, 2] image-1 points; p2: [N, 2] image-2 points.
      mask: [N] correspondence validity.
      threshold: inlier gate in pixels (compared against Sampson distance;
        the gate is ``d < threshold²`` — same as `geometry/ransac.py`).
      exact: True → manual 3-pass bf16-split dots (count parity with the
        f32 XLA reference); False → native single-pass bf16 MXU dots
        (~2× faster kernel; counts jitter by a few near-threshold gates —
        fine when the caller only ranks hypotheses and recomputes the
        winner's mask exactly, see RansacConfig.score_mode).

    Returns counts [H] int32 —
    ``sum(sampson_distance(F_h, p1, p2) < threshold² & mask, axis=-1)``.
    Exact in interpret mode; on hardware, MXU f32 rounding can flip gates
    that sit within ~1e-6 relative of the threshold (immaterial for
    consensus ranking).
    """
    h = F_h.shape[0]
    n = p1.shape[0]
    hp = -(-h // tile_h) * tile_h
    np_ = -(-n // tile_n) * tile_n

    F_row = _pad_to(F_h.reshape(h, 9), hp, 0)
    F_col = _pad_to(jnp.swapaxes(F_h, -1, -2).reshape(h, 9), hp, 0)

    ones = jnp.ones((n, 1), p1.dtype)
    p1h = jnp.concatenate([p1, ones], axis=-1)  # [N, 3]
    p2h = jnp.concatenate([p2, ones], axis=-1)
    P1t = _pad_to(p1h.T, np_, 1)
    P2t = _pad_to(p2h.T, np_, 1)
    valid = _pad_to(mask.astype(jnp.float32), np_, 0)[None, :]

    grid = (hp // tile_h, np_ // tile_n)
    counts = pl.pallas_call(
        functools.partial(
            _score_kernel, tau2=float(threshold) ** 2, eps=1e-12,
            exact=exact,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, 9), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 9), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile_h, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * hp * np_ * 5 * 3 + 12 * hp * np_,
            bytes_accessed=4 * (grid[1] * hp * 18 + grid[0] * np_ * 7 + hp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(F_row, F_col, P1t, P2t, valid)
    return counts[:h, 0]
