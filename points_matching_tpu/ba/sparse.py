"""Sparse observation-list bundle adjustment — O(observations) memory.

The dense-grid engine (``ba/lm.py`` + ``ba/schur.py``) materializes the
camera×landmark coupling ``W`` as ``[C, L, 6, 3]``; at BASELINE scale
(hundreds of cameras × 10⁴–10⁶ landmarks) that is terabytes.  This module
is the SURVEY.md §7 "sparse BA on dense hardware" layout: everything is
computed directly from the flat observation arrays ``(cam_idx, lm_idx, uv)``
— per-observation residual/Jacobian evaluation (VPU, vmapped jacfwd),
normal-equation blocks by ``segment_sum`` scatter-adds, and the reduced
camera system solved by Jacobi-preconditioned CG with an *implicit* Schur
matvec (the classic ITERATIVE_SCHUR structure):

    S x = U x − Σ_l W_{·l} V_l⁻¹ (Σ_o W_oᵀ x_{cam(o)})

assembled as two segment-sums per matvec — ``[C, L]`` never exists.

Duplicate (c, l) observations are handled exactly (their normal-equation
contributions add), unlike the dense grid's last-write-wins conversion.

Distribution: shard the observation axis; every segment_sum becomes a
local partial + ``psum`` over the mesh.  That plan is implemented here —
every assembly/matvec helper takes ``axis_name``; when set (inside a
``shard_map`` whose per-observation arrays are split on that mesh axis,
see ``parallel.sharded_ba.distributed_bundle_adjust_sparse``) each
segment_sum reduces the local observations and a ``psum`` completes the
global sum, leaving U/V/g/S·x replicated while Wo/cam/lm stay local.
Replaces nothing — the dense grid stays the fastest layout for small,
dense problems (two-view, local windows ≤ a few cameras × few-k
landmarks); ``pipelines/sfm.py`` picks per problem size.

(Extension surface beyond the reference, which has no BA at all —
``Points Matching/main.cpp`` stops at F; SURVEY.md §2.3/§7 stage 6.)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from points_matching_tpu.ba.residuals import _residual_one
from points_matching_tpu.ba.schur import _damp, _inv3
from points_matching_tpu.core.config import BAConfig
from points_matching_tpu.core.types import CameraIntrinsics, Pose
from points_matching_tpu.geometry.se3 import se3_exp


def _preduce(x, axis_name: Optional[str]):
    """Complete a segment_sum across the observation shards: identity when
    single-device, ``psum`` when running under shard_map."""
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


@struct.dataclass
class SparseBAState:
    """BA problem as flat observation lists (padded + masked)."""

    poses: Pose               # [C] world→camera
    X: Array                  # [L, 3]
    cam_idx: Array            # [O] int32 camera per observation
    lm_idx: Array             # [O] int32 landmark per observation
    uv: Array                 # [O, 2] measurements
    obs_mask: Array           # [O] validity
    cam_fixed: Array          # [C] bool — gauge-fixed cameras

    @property
    def num_cameras(self) -> int:
        return self.poses.t.shape[0]

    @property
    def num_landmarks(self) -> int:
        return self.X.shape[0]

    @property
    def num_observations(self) -> int:
        return self.uv.shape[0]


def make_sparse_ba_state(
    poses: Pose,
    X: Array,
    cam_idx: Array,
    lm_idx: Array,
    uv: Array,
    obs_mask: Array,
    num_fixed_cameras: int = 1,
) -> SparseBAState:
    C = poses.t.shape[0]
    return SparseBAState(
        poses=poses,
        X=X,
        cam_idx=cam_idx.astype(jnp.int32),
        lm_idx=lm_idx.astype(jnp.int32),
        uv=uv,
        obs_mask=obs_mask.astype(bool),
        cam_fixed=jnp.arange(C) < num_fixed_cameras,
    )


def _gathered(state: SparseBAState):
    """Clip indices (masked rows may carry garbage) and gather per-obs
    camera/landmark parameters."""
    c = jnp.clip(state.cam_idx, 0, state.num_cameras - 1)
    l = jnp.clip(state.lm_idx, 0, state.num_landmarks - 1)
    R = state.poses.R[c]
    t = state.poses.t[c]
    Xo = state.X[l]
    return c, l, R, t, Xo


def sparse_residuals(state: SparseBAState, K: CameraIntrinsics) -> Array:
    """Masked per-observation residuals [O, 2] (invalid → 0)."""
    _, _, R, t, Xo = _gathered(state)
    z6 = jnp.zeros((6,), state.X.dtype)
    z3 = jnp.zeros((3,), state.X.dtype)
    r = jax.vmap(
        lambda Ri, ti, Xi, uvi: _residual_one(z6, z3, Ri, ti, Xi, uvi, K)
    )(R, t, Xo, state.uv)
    return jnp.where(state.obs_mask[:, None], r, 0.0)


def sparse_residuals_and_jacobians(
    state: SparseBAState, K: CameraIntrinsics
) -> Tuple[Array, Array, Array]:
    """Per-observation residuals and Jacobians.

    Returns r [O, 2], Jc [O, 2, 6], Jl [O, 2, 3] (masked rows zeroed).
    """
    _, _, R, t, Xo = _gathered(state)
    z6 = jnp.zeros((6,), state.X.dtype)
    z3 = jnp.zeros((3,), state.X.dtype)

    def one(Ri, ti, Xi, uvi):
        f = lambda dp, dl: _residual_one(dp, dl, Ri, ti, Xi, uvi, K)
        return f(z6, z3), jax.jacfwd(f, 0)(z6, z3), jax.jacfwd(f, 1)(z6, z3)

    r, Jc, Jl = jax.vmap(one)(R, t, Xo, state.uv)
    m = state.obs_mask[:, None]
    return (
        jnp.where(m, r, 0.0),
        jnp.where(m[..., None], Jc, 0.0),
        jnp.where(m[..., None], Jl, 0.0),
    )


class SparseNormalEq(NamedTuple):
    """Normal-equation blocks in observation-list form.

    The coupling W stays per-observation ([O, 6, 3]) — the [C, L] grid is
    never formed; Schur products contract it with two segment-sums.
    """

    U: Array        # [C, 6, 6]
    V: Array        # [L, 3, 3]
    Wo: Array       # [O, 6, 3] per-observation coupling Jcᵀ w Jl
    bc: Array       # [C, 6]
    bl: Array       # [L, 3]
    cam: Array      # [O] clipped camera index
    lm: Array       # [O] clipped landmark index


def build_sparse_normal_equations(
    state: SparseBAState,
    r: Array,
    Jc: Array,
    Jl: Array,
    weights: Array,
    axis_name: Optional[str] = None,
) -> SparseNormalEq:
    """Segment-sum assembly of the GN blocks from observation lists.

    weights: [O] (robust IRLS × validity; 0 for invalid rows).
    With ``axis_name``, O is the per-device shard and U/V/bc/bl are psum'd
    to replicated; Wo/cam/lm remain the local shard.
    """
    C, L = state.num_cameras, state.num_landmarks
    cam = jnp.clip(state.cam_idx, 0, C - 1)
    lm = jnp.clip(state.lm_idx, 0, L - 1)
    w = weights[:, None, None]

    Jcw = Jc * w          # [O, 2, 6]
    Uo = jnp.einsum("oki,okj->oij", Jcw, Jc)           # [O, 6, 6]
    Vo = jnp.einsum("oki,okj->oij", Jl * w, Jl)        # [O, 3, 3]
    Wo = jnp.einsum("oki,okj->oij", Jcw, Jl)           # [O, 6, 3]
    wr = r * weights[:, None]
    bco = -jnp.einsum("oki,ok->oi", Jc, wr)            # [O, 6]
    blo = -jnp.einsum("oki,ok->oi", Jl, wr)            # [O, 3]

    U = _preduce(jax.ops.segment_sum(Uo, cam, num_segments=C), axis_name)
    V = _preduce(jax.ops.segment_sum(Vo, lm, num_segments=L), axis_name)
    bc = _preduce(jax.ops.segment_sum(bco, cam, num_segments=C), axis_name)
    bl = _preduce(jax.ops.segment_sum(blo, lm, num_segments=L), axis_name)
    return SparseNormalEq(U=U, V=V, Wo=Wo, bc=bc, bl=bl, cam=cam, lm=lm)


def sparse_schur_matvec(
    eq: SparseNormalEq,
    Vinv: Array,
    lam: Array,
    x: Array,
    axis_name: Optional[str] = None,
) -> Array:
    """Implicit S @ x = (U − W V⁻¹ Wᵀ) x via two segment-sums.  [C, 6].

    Distributed: x, U, Vinv are replicated; the two segment-sums reduce the
    local observation shard and psum to global ([L, 3] then [C, 6]) — the
    exact "local partial + psum" plan from the module docstring.
    """
    C = eq.U.shape[0]
    L = eq.V.shape[0]
    U = _damp(eq.U, lam)
    Ux = jnp.einsum("cij,cj->ci", U, x)
    # t_l = Σ_{o: lm(o)=l} W_oᵀ x_{cam(o)}
    Wtx = jnp.einsum("oij,oi->oj", eq.Wo, x[eq.cam])        # [O, 3]
    t = _preduce(
        jax.ops.segment_sum(Wtx, eq.lm, num_segments=L), axis_name
    )                                                        # [L, 3]
    u = jnp.einsum("lij,lj->li", Vinv, t)                   # [L, 3]
    # y_c = Σ_{o: cam(o)=c} W_o u_{lm(o)}
    Wu = jnp.einsum("oij,oj->oi", eq.Wo, u[eq.lm])          # [O, 6]
    y = _preduce(
        jax.ops.segment_sum(Wu, eq.cam, num_segments=C), axis_name
    )                                                        # [C, 6]
    return Ux - y


def _sparse_schur_prep(
    eq: SparseNormalEq, lam: Array, axis_name: Optional[str] = None
):
    """Damped V⁻¹, reduced gradient g, and the Jacobi preconditioner
    (exact 6×6 diagonal blocks of S, one segment-sum)."""
    C = eq.U.shape[0]
    Vinv = _inv3(_damp(eq.V, lam))
    # g = bc − W V⁻¹ bl
    Vb = jnp.einsum("lij,lj->li", Vinv, eq.bl)              # [L, 3]
    WVb = jnp.einsum("oij,oj->oi", eq.Wo, Vb[eq.lm])        # [O, 6]
    g = eq.bc - _preduce(
        jax.ops.segment_sum(WVb, eq.cam, num_segments=C), axis_name
    )
    # diag blocks: S_cc = U_c − Σ_{o: cam=c} W_o Vinv_{lm(o)} W_oᵀ
    WVWo = jnp.einsum("oij,ojk,olk->oil", eq.Wo, Vinv[eq.lm], eq.Wo)
    S_diag = _damp(eq.U, lam) - _preduce(
        jax.ops.segment_sum(WVWo, eq.cam, num_segments=C), axis_name
    )
    Minv = jnp.linalg.inv(S_diag)
    return Vinv, g, Minv


def solve_sparse_schur_pcg(
    eq: SparseNormalEq,
    lam: Array,
    iterations: int = 50,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Jacobi-preconditioned CG on the implicit reduced camera system +
    landmark back-substitution.  Returns (dc [C, 6], dl [L, 3]).

    Distributed: the CG state (x, r, p — all [C, 6]) is replicated, so the
    dot products need no collective; only the two segment-sums inside each
    matvec psum.
    """
    L = eq.V.shape[0]
    Vinv, g, Minv = _sparse_schur_prep(eq, lam, axis_name)

    mv = lambda x: sparse_schur_matvec(eq, Vinv, lam, x, axis_name)
    precond = lambda r: jnp.einsum("cij,cj->ci", Minv, r)

    x = jnp.zeros_like(g)
    r = g - mv(x)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(i, carry):
        x, r, p, rz = carry
        Ap = mv(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-12)
        p = z + beta * p
        return x, r, p, rz_new

    dc, r, p, rz = jax.lax.fori_loop(0, iterations, body, (x, r, p, rz))
    # back-substitute: dl = V⁻¹ (bl − Σ_{o: lm=l} W_oᵀ dc_{cam(o)})
    Wtdc = jnp.einsum("oij,oi->oj", eq.Wo, dc[eq.cam])
    rhs = eq.bl - _preduce(
        jax.ops.segment_sum(Wtdc, eq.lm, num_segments=L), axis_name
    )
    dl = jnp.einsum("lij,lj->li", Vinv, rhs)
    return dc, dl


def sparse_ba_cost(
    state: SparseBAState,
    K: CameraIntrinsics,
    huber_delta: float = 0.0,
    axis_name: Optional[str] = None,
) -> Array:
    r = sparse_residuals(state, K)
    if huber_delta > 0:
        n = jnp.linalg.norm(r, axis=-1)
        per = jnp.where(
            n <= huber_delta, 0.5 * n**2, huber_delta * (n - 0.5 * huber_delta)
        )
    else:
        per = 0.5 * jnp.sum(r * r, axis=-1)
    return _preduce(jnp.sum(jnp.where(state.obs_mask, per, 0.0)), axis_name)


def _sparse_huber_weights(r: Array, delta: float) -> Array:
    if delta <= 0:
        return jnp.ones(r.shape[:-1], r.dtype)
    norm = jnp.linalg.norm(r, axis=-1)
    return jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, 1e-12))


class SparseLMStats(NamedTuple):
    iterations: Array
    initial_cost: Array
    final_cost: Array
    lam: Array


def _apply_update(state: SparseBAState, dc: Array, dl: Array) -> SparseBAState:
    dc = jnp.where(state.cam_fixed[:, None], 0.0, dc)
    Rd, td = se3_exp(dc)
    newR = Rd @ state.poses.R
    newt = jnp.einsum("cij,cj->ci", Rd, state.poses.t) + td
    return state.replace(poses=Pose(R=newR, t=newt), X=state.X + dl)


def _bundle_adjust_sparse_impl(
    state: SparseBAState,
    K: CameraIntrinsics,
    config: BAConfig,
    axis_name: Optional[str] = None,
) -> Tuple[SparseBAState, SparseLMStats]:
    """LM loop body shared by the single-device jit and the shard_map'd
    distributed path (``axis_name`` set ⇒ per-observation arrays are the
    local shard; poses/X/stats replicated)."""
    cost0 = sparse_ba_cost(state, K, config.huber_delta, axis_name)

    def step(carry):
        state, lam, cost, it, done = carry
        r, Jc, Jl = sparse_residuals_and_jacobians(state, K)
        w = _sparse_huber_weights(r, config.huber_delta)
        w = w * state.obs_mask.astype(r.dtype)
        eq = build_sparse_normal_equations(state, r, Jc, Jl, w, axis_name)
        dc, dl = solve_sparse_schur_pcg(
            eq, lam, config.pcg_iterations, axis_name
        )

        new_state = _apply_update(state, dc, dl)
        new_cost = sparse_ba_cost(new_state, K, config.huber_delta, axis_name)
        accept = new_cost < cost

        state = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new_state, state
        )
        cost_next = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * config.damping_down, lam * config.damping_up)
        lam = jnp.clip(lam, 1e-10, 1e6)
        rel = jnp.abs(cost - cost_next) / jnp.maximum(cost, 1e-12)
        done = jnp.logical_and(accept, rel < config.rtol)
        return state, lam, cost_next, it + 1, done

    def cond(carry):
        _, _, _, it, done = carry
        return jnp.logical_and(it < config.max_iterations, jnp.logical_not(done))

    lam0 = jnp.asarray(config.damping_init, jnp.float32)
    state, lam, cost, it, _ = jax.lax.while_loop(
        cond, step, (state, lam0, cost0, jnp.asarray(0), jnp.asarray(False))
    )
    return state, SparseLMStats(
        iterations=it, initial_cost=cost0, final_cost=cost, lam=lam
    )


@partial(jax.jit, static_argnames=("config",))
def bundle_adjust_sparse(
    state: SparseBAState,
    K: CameraIntrinsics,
    config: BAConfig = BAConfig(),
) -> Tuple[SparseBAState, SparseLMStats]:
    """LM on observation lists — same contract as ``ba.lm.bundle_adjust``
    (monotone cost, whole loop one jit region) at O(O) memory.

    Solver is always the implicit-Schur PCG (``config.pcg_iterations``);
    a dense Cholesky would need the [C6, C6] S this layout avoids.
    """
    return _bundle_adjust_sparse_impl(state, K, config, axis_name=None)
