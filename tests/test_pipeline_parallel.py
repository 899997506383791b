"""Pipeline parallelism (SURVEY.md §2.3 P3): GPipe-style staged execution
over a ``stage`` mesh axis must match sequential composition exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from points_matching_tpu.parallel.mesh import make_mesh
from points_matching_tpu.parallel.pipeline import STAGE_AXIS, pipeline_stages


def _wire(m, key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return {
        "x": jax.random.normal(k1, (m, 4, 3), jnp.float32),
        "n": jnp.arange(m, dtype=jnp.int32),
        "w": jax.random.normal(k2, (m, 3), jnp.float32),
    }


def _stages():
    def frontend(w):
        return {**w, "x": jnp.tanh(w["x"]), "n": w["n"] + 1}

    def matching(w):
        return {**w, "w": w["x"].sum(0) + w["w"], "n": w["n"] * 2}

    def geometry(w):
        return {**w, "x": w["x"] * w["w"][None, :], "n": w["n"] + 3}

    def refine(w):
        return {**w, "x": w["x"] - w["x"].mean(), "w": 2.0 * w["w"]}

    return [frontend, matching, geometry, refine]


def _sequential(stage_fns, xs):
    def compose(x):
        for f in stage_fns:
            x = f(x)
        return x

    return jax.lax.map(compose, xs)


def test_single_device_matches_composition():
    xs = _wire(5)
    got = pipeline_stages(_stages(), xs, mesh=None)
    want = _sequential(_stages(), xs)
    jax.tree.map(np.testing.assert_allclose, got, want)


@pytest.mark.parametrize("m", [1, 4, 9])
def test_staged_matches_sequential(m):
    mesh = make_mesh((4,), (STAGE_AXIS,), devices=jax.devices()[:4])
    xs = _wire(m, key=m)
    got = jax.jit(
        lambda xs: pipeline_stages(_stages(), xs, mesh=mesh)
    )(xs)
    want = _sequential(_stages(), xs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
        got,
        want,
    )


def test_two_stage_pipeline():
    mesh = make_mesh((2,), (STAGE_AXIS,), devices=jax.devices()[:2])
    fns = _stages()[:2]
    xs = _wire(6, key=7)
    got = pipeline_stages(fns, xs, mesh=mesh)
    want = _sequential(fns, xs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
        got,
        want,
    )


def test_stage_count_mismatch_raises():
    mesh = make_mesh((4,), (STAGE_AXIS,), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="stage axis"):
        pipeline_stages(_stages()[:3], _wire(2), mesh=mesh)
