"""Distributed bundle adjustment: landmark-sharded Schur reduction
(SURVEY.md §2.3 P2/P4, §5 "Distributed Schur": shard the landmark axis,
reduce per-block Hᵀ H contributions with one collective).

Idiom: GSPMD.  The LM loop in ``ba/lm.py`` is pure and already expresses
the Schur complement as einsums over the landmark axis; here we only
*annotate* the state's shardings (landmarks and the [C, L] observation grid
split on ``model``; poses replicated) and let XLA insert the psum for the
reduced camera system S = U − Σ_l Y_l W_lᵀ and its Cholesky on replicated
data.  Per the scaling-book recipe: pick the mesh, annotate, let the
compiler place collectives on ICI.

The camera axis stays replicated because C ≪ L in SfM problems (hundreds of
cameras vs 10⁴-10⁶ landmarks) and the camera solve is the sequential
bottleneck; the landmark elimination — the O(C²·L) FLOPs — is what shards.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from points_matching_tpu.ba.lm import BAState, LMStats, bundle_adjust
from points_matching_tpu.core.config import BAConfig
from points_matching_tpu.core.types import CameraIntrinsics, Pose
from points_matching_tpu.parallel.mesh import MODEL_AXIS


def ba_state_shardings(mesh: Mesh) -> BAState:
    """The sharding pytree for ``BAState``: landmark axis on ``model``."""
    rep = NamedSharding(mesh, P())
    lm = NamedSharding(mesh, P(MODEL_AXIS))
    grid = NamedSharding(mesh, P(None, MODEL_AXIS))
    return BAState(
        poses=Pose(R=rep, t=rep),
        X=lm,
        uv=grid,
        mask=grid,
        cam_fixed=rep,
    )


def shard_ba_state(state: BAState, mesh: Mesh) -> BAState:
    """Place a BAState onto the mesh with landmark sharding."""
    return jax.device_put(state, ba_state_shardings(mesh))


def distributed_bundle_adjust(
    state: BAState,
    K: CameraIntrinsics,
    mesh: Mesh,
    config: BAConfig = BAConfig(),
) -> Tuple[BAState, LMStats]:
    """Landmark-sharded LM bundle adjustment.

    The landmark capacity must divide the ``model`` axis size.  Inputs are
    re-placed onto the mesh if not already sharded; outputs keep the same
    shardings (X/uv/mask sharded, poses replicated).
    """
    L = state.X.shape[0]
    n_model = mesh.shape[MODEL_AXIS]
    if L % n_model != 0:
        raise ValueError(
            f"landmark capacity ({L}) must divide model axis ({n_model}); "
            "pad with masked landmarks"
        )
    state = shard_ba_state(state, mesh)
    K = jax.device_put(K, NamedSharding(mesh, P()))
    return bundle_adjust(state, K, config)
