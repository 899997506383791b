"""Descriptor matching as MXU GEMMs + top-k — the TPU-native replacement for
FLANN's KD-trees (implicit native component N3, SURVEY.md §2.2; demo call
site ``Points Matching/main.cpp:44-46``).

Where FLANN builds randomized KD-trees and answers approximate 1-NN queries,
TPUs prefer the exact brute-force form: the [N1, N2] squared-L2 matrix is
``‖a‖² + ‖b‖² − 2 a bᵀ`` — one MXU-bound GEMM — followed by a fused row-wise
top-k.  Exact, batched, and faster per pair than tree traversal at these
sizes.  Binary (ORB) descriptors use popcount-Hamming on bit-packed words.

Filters: Lowe ratio (default), absolute threshold, mutual cross-check, and
the reference demo's midpoint rule ``d < min + (max−min)/2``
(``main.cpp:49-69``) for parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from points_matching_tpu.core.config import MatcherConfig
from points_matching_tpu.core.types import Descriptors, Matches

_BIG = 1e30


def _popcount(x: Array) -> Array:
    """Per-element popcount of uint32 words (SWAR bit-twiddling — maps to a
    handful of VPU integer ops)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_distance_matrix(a_bits: Array, b_bits: Array) -> Array:
    """[N1, W] × [N2, W] packed uint32 → [N1, N2] int32 Hamming distances.

    XOR+popcount over the word axis.  (A Pallas kernel specializes this on
    TPU — see ``ops/pallas/hamming.py``; this is the XLA reference form.)
    """
    x = jnp.bitwise_xor(a_bits[..., :, None, :], b_bits[..., None, :, :])
    return jnp.sum(_popcount(x), axis=-1)


def l2_distance_matrix(a: Array, b: Array, compute_dtype: str = "f32") -> Array:
    """[N1, D] × [N2, D] → [N1, N2] squared-L2 distances via the GEMM
    identity ‖a−b‖² = ‖a‖² + ‖b‖² − 2⟨a, b⟩ (MXU path).

    ``compute_dtype='bf16'`` feeds the GEMM bf16 operands (f32 accumulation
    — the MXU's native mode, ~4× f32 matmul throughput); the norms stay f32
    so the diagonal is exact.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    if compute_dtype == "bf16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    ab = jnp.einsum("...id,...jd->...ij", a, b, preferred_element_type=jnp.float32)
    d2 = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * ab
    return jnp.maximum(d2, 0.0)


def distance_matrix(
    d1: Descriptors, d2: Descriptors, metric: str = "l2",
    compute_dtype: str = "f32",
) -> Array:
    """Masked distance matrix [N1, N2]; invalid rows/cols get +inf-like."""
    if metric == "hamming":
        d = hamming_distance_matrix(d1.data, d2.data).astype(jnp.float32)
    elif metric == "l2":
        d = l2_distance_matrix(d1.data, d2.data, compute_dtype)
    elif metric == "dot":
        d = -jnp.einsum(
            "...id,...jd->...ij", d1.data, d2.data, preferred_element_type=jnp.float32
        )
    else:
        raise ValueError(f"unknown metric: {metric!r}")
    invalid = jnp.logical_or(
        ~d1.mask[..., :, None], ~d2.mask[..., None, :]
    )
    return jnp.where(invalid, _BIG, d)


def _argmin_top2(d: Array) -> Tuple[Array, Array]:
    """Exact top-2 smallest per row via two argmin passes.

    On TPU, ``lax.top_k`` lowers to a full variadic sort of the row
    (O(N log² N) bitonic network); two masked argmin reductions are two
    O(N) VPU passes over the same data — strictly less work and measurably
    faster at matching sizes (benchmarks/probe/match_variants.py compares
    the variants end-to-end).  Ties resolve to the lowest index,
    same as top_k over distinct values; for duplicated minima the pair
    {best, second} is still correct (two distinct positions).
    """
    n = d.shape[-1]
    i1 = jnp.argmin(d, axis=-1)
    v1 = jnp.take_along_axis(d, i1[..., None], axis=-1)[..., 0]
    masked = jnp.where(jnp.arange(n) == i1[..., None], _BIG, d)
    i2 = jnp.argmin(masked, axis=-1)
    v2 = jnp.take_along_axis(masked, i2[..., None], axis=-1)[..., 0]
    return (
        jnp.stack([v1, v2], axis=-1),
        jnp.stack([i1, i2], axis=-1).astype(jnp.int32),
    )


def knn_match(
    d1: Descriptors, d2: Descriptors, k: int = 2, metric: str = "l2",
    compute_dtype: str = "f32",
) -> Tuple[Array, Array]:
    """k nearest train descriptors per query row.

    Returns (dist [N1, k], idx [N1, k]); distances are squared-L2 for the
    'l2' metric (take sqrt for FLANN/DMatch parity).
    """
    d = distance_matrix(d1, d2, metric, compute_dtype)
    if k == 1:
        i1 = jnp.argmin(d, axis=-1)
        v1 = jnp.take_along_axis(d, i1[..., None], axis=-1)
        return v1, i1[..., None].astype(jnp.int32)
    if k == 2:
        return _argmin_top2(d)
    neg_topk, idx = jax.lax.top_k(-d, k)
    return -neg_topk, idx


def _use_pallas_path(d1: Descriptors, d2: Descriptors, config: MatcherConfig) -> bool:
    """Route the L2/Hamming path to the fused Pallas distance+top-2 kernels.

    'auto' enables it on TPU backends only (the kernels compile via Mosaic);
    CPU tests exercise it explicitly through interpret mode.
    """
    if config.metric not in ("l2", "hamming") or d1.data.ndim != 2:
        return False
    if config.backend == "pallas":
        return True
    if config.backend != "auto":
        return False
    # Measured with TRUE chunk-fetch sync on the bench chip (r3,
    # benchmarks/probe/match_variants.py — the r2 crossover numbers were
    # dispatch-bound artifacts): at 512×512×64 the fused kernel runs the
    # FULL matcher at 4.1 µs/pair vs 17.3 µs for the XLA path (the XLA path
    # pays ~3 extra full-matrix passes: the validity `where`, the argmin
    # re-read, and the second-best masking).  The kernel self-pads to its
    # tiles, so the gate is only there to keep tiny problems (where padding
    # to the 256×512 tile wastes the work) on the one-GEMM path.
    min_cells = 256 * 256
    if d1.capacity * d2.capacity < min_cells:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return platform in ("tpu", "axon")


def match_descriptors(
    d1: Descriptors,
    d2: Descriptors,
    config: MatcherConfig = MatcherConfig(),
) -> Matches:
    """1-NN matching with the configured filter — the full replacement for
    ``FlannBasedMatcher::match`` + the reference's min/max scan and midpoint
    filter (``main.cpp:44-79``).

    Returns a fixed-capacity Matches (capacity = query capacity, or
    ``config.max_matches``) with surviving matches compacted to the front.
    """
    k = 2 if (config.filter == "ratio") else 1
    use_pallas = _use_pallas_path(d1, d2, config)

    def _fused_top2(dq: Descriptors, dt: Descriptors) -> Tuple[Array, Array]:
        if config.metric == "hamming":
            from points_matching_tpu.ops.pallas.hamming import fused_hamming_top2

            dist, idx = fused_hamming_top2(dq.data, dt.data, dt.mask)
        else:
            from points_matching_tpu.ops.pallas.matching_kernel import fused_l2_top2

            dist, idx = fused_l2_top2(dq.data, dt.data, dt.mask,
                                      compute_dtype=config.compute_dtype)
        # query-side masking (the kernels only mask train rows)
        return jnp.where(dq.mask[..., None], dist, _BIG), idx

    if use_pallas:
        dist, idx = _fused_top2(d1, d2)
    else:
        dist, idx = knn_match(d1, d2, k=k, metric=config.metric,
                              compute_dtype=config.compute_dtype)
    best = dist[..., 0]
    best_idx = idx[..., 0]

    valid = jnp.logical_and(d1.mask, best < _BIG / 2)

    if config.metric == "l2":
        # FLANN reports true L2 (OpenCV takes sqrt of FLANN's squared L2) —
        # match that so thresholds/ratios are comparable.
        best_reported = jnp.sqrt(best)
        second_reported = jnp.sqrt(dist[..., 1]) if k == 2 else None
    else:
        best_reported = best
        second_reported = dist[..., 1] if k == 2 else None

    if config.filter == "ratio":
        keep = best_reported < config.ratio * jnp.maximum(second_reported, 1e-12)
    elif config.filter == "midpoint":
        # Reference rule (main.cpp:49-69): min initialized to 1, max to 0;
        # keep d < min + (max-min)/2.
        masked = jnp.where(valid, best_reported, jnp.inf)
        dmin = jnp.minimum(jnp.min(masked, axis=-1, keepdims=True), 1.0)
        masked_neg = jnp.where(valid, best_reported, -jnp.inf)
        dmax = jnp.maximum(jnp.max(masked_neg, axis=-1, keepdims=True), 0.0)
        keep = best_reported < dmin + (dmax - dmin) / 2.0
    elif config.filter == "threshold":
        keep = best_reported < config.threshold
    elif config.filter == "none":
        keep = jnp.ones_like(valid)
    else:
        raise ValueError(f"unknown filter: {config.filter!r}")
    keep = jnp.logical_and(keep, valid)

    if config.cross_check:
        # mutual 1-NN: train j's best query must be this query i.  The
        # reverse pass rides the same fused kernel when the Pallas backend
        # is active — otherwise it would re-materialize the [N2, N1] matrix
        # the forward kernel exists to avoid.
        if use_pallas:
            _, it = _fused_top2(d2, d1)
        else:
            _, it = knn_match(d2, d1, k=1, metric=config.metric,
                              compute_dtype=config.compute_dtype)
        reverse_best = jnp.take(it[..., 0], jnp.clip(best_idx, 0, d2.capacity - 1), axis=-1)
        qi = jnp.arange(d1.capacity)
        keep = jnp.logical_and(keep, reverse_best == qi)

    query_idx = jnp.arange(d1.capacity, dtype=jnp.int32)

    if not config.compact:
        # Query-order form: row i is query i's best match, mask = survived.
        # No cumsum/scatter epilogue — mask-aware consumers (RANSAC) don't
        # need the dense prefix, and the scatter runs on the scalar unit
        # (~10 ns/row — the dominant matcher cost once the fused kernel
        # does the distances).
        return Matches(
            query_idx=query_idx,
            train_idx=jnp.where(keep, best_idx.astype(jnp.int32), 0),
            distance=jnp.where(keep, best_reported, 0.0),
            mask=keep,
        )

    # Clamp to the query capacity: a max_matches beyond it would slice into
    # the overflow slot (whose discarded arbitrary entry must never surface)
    # and desync the buffer/mask lengths (ADVICE r3).
    cap = min(config.max_matches or d1.capacity, d1.capacity)
    # Compact surviving matches to the front (stable) so downstream
    # fixed-capacity consumers see a dense prefix.  One cumsum + one
    # scatter — O(N) — instead of the O(N log² N) bitonic argsort TPU
    # lowers a sort to; discarded entries all land in an overflow slot
    # that the final slice drops.
    slot = jnp.where(keep, jnp.cumsum(keep) - 1, d1.capacity)
    n_keep = jnp.sum(keep.astype(jnp.int32))

    def compact(vals, fill):
        buf = jnp.full((d1.capacity + 1,), fill, dtype=vals.dtype)
        return buf.at[slot].set(vals, mode="drop")[:cap]

    return Matches(
        query_idx=compact(query_idx, jnp.int32(0)),
        train_idx=compact(best_idx.astype(jnp.int32), jnp.int32(0)),
        distance=compact(best_reported, jnp.float32(0.0)),
        mask=jnp.arange(cap) < n_keep,
    )


def match_descriptors_points(
    d1: Descriptors,
    d2: Descriptors,
    t_points: Array,
    config: MatcherConfig = MatcherConfig(),
) -> Tuple[Matches, Array]:
    """Query-order 1-NN matching + the matched TRAIN POINT per query row.

    Hot-path companion to ``match_descriptors(compact=False)``: the
    caller-side ``t_points[train_idx]`` row gather runs element-at-a-time
    on the TPU scalar path (measured ~3.3 µs/pair of the 17 µs two-view
    step, r5 ``benchmarks/probe/ransac_slices.py``); on the Pallas path
    the point rides out of the matching kernel as a fused one-hot dot
    (``fused_l2_top2_points``).  Supported fast configuration: metric
    'l2', no cross-check, no compaction; anything else falls back to
    ``match_descriptors`` + an explicit gather.

    Returns (Matches in query order, pts [N1, P] with
    ``pts[i] == t_points[train_idx[i]]`` on EVERY row — filtered rows
    report train_idx 0 and t_points[0], identical on the fused and
    fallback paths).
    """
    fast = (
        config.metric == "l2"
        and not config.cross_check
        and not config.compact
        and config.filter in ("ratio", "threshold", "none")
        and _use_pallas_path(d1, d2, config)
    )
    if not fast:
        m = match_descriptors(d1, d2, config)
        n2 = t_points.shape[0]
        pts = jnp.take(
            t_points, jnp.clip(m.train_idx, 0, n2 - 1), axis=0
        )
        return m, pts

    from points_matching_tpu.ops.pallas.matching_kernel import (
        fused_l2_top2_points,
    )

    dist, idx, pts = fused_l2_top2_points(
        d1.data, d2.data, d2.mask, t_points,
        compute_dtype=config.compute_dtype,
    )
    dist = jnp.where(d1.mask[..., None], dist, _BIG)
    best = dist[..., 0]
    best_idx = idx[..., 0]
    valid = jnp.logical_and(d1.mask, best < _BIG / 2)
    best_reported = jnp.sqrt(best)
    second_reported = jnp.sqrt(dist[..., 1])
    if config.filter == "ratio":
        keep = best_reported < config.ratio * jnp.maximum(second_reported,
                                                          1e-12)
    elif config.filter == "threshold":
        keep = best_reported < config.threshold
    else:
        keep = jnp.ones_like(valid)
    keep = jnp.logical_and(keep, valid)
    # keep pts aligned with the reported train_idx on FILTERED rows too
    # (they are forced to 0): the documented invariant
    # pts[i] == t_points[train_idx[i]] must hold on every row, and the
    # XLA fallback path produces exactly t_points[0] there.
    pts = jnp.where(keep[:, None], pts, t_points[0][None, :])
    m = Matches(
        query_idx=jnp.arange(d1.capacity, dtype=jnp.int32),
        train_idx=jnp.where(keep, best_idx.astype(jnp.int32), 0),
        distance=jnp.where(keep, best_reported, 0.0),
        mask=keep,
    )
    return m, pts


def match_stats(m: Matches) -> Tuple[Array, Array]:
    """(min, max) distance over valid matches — the reference's min/max scan
    (``main.cpp:49-59``), including its min=1 / max=0 initialization."""
    dmin = jnp.minimum(jnp.min(jnp.where(m.mask, m.distance, jnp.inf), axis=-1), 1.0)
    dmax = jnp.maximum(jnp.max(jnp.where(m.mask, m.distance, -jnp.inf), axis=-1), 0.0)
    return dmin, dmax
