"""Pallas kernels vs their pure-jnp references (SURVEY.md §4 "Kernel
tests": interpret mode on CPU, compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from points_matching_tpu.core.types import Descriptors
from points_matching_tpu.ops.matching import knn_match
from points_matching_tpu.ops.pallas.matching_kernel import fused_l2_top2


def _ref_top2(q, t, t_mask):
    d1 = Descriptors(data=q, mask=jnp.ones((q.shape[0],), bool))
    d2 = Descriptors(data=t, mask=t_mask)
    dist, idx = knn_match(d1, d2, k=2)
    return dist, idx


@pytest.mark.parametrize("n1,n2", [(512, 512), (300, 450), (64, 700)])
def test_fused_l2_top2_matches_reference(n1, n2):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (n1, 64))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jax.random.normal(k2, (n2, 64))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    t_mask = jnp.arange(n2) < (n2 - 17)  # some invalid train rows

    ref_dist, ref_idx = _ref_top2(q, t, t_mask)
    out_dist, out_idx = fused_l2_top2(q, t, t_mask, interpret=True)

    np.testing.assert_array_equal(np.asarray(out_idx[:, 0]), np.asarray(ref_idx[:, 0]))
    np.testing.assert_allclose(np.asarray(out_dist[:, 0]),
                               np.asarray(ref_dist[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dist[:, 1]),
                               np.asarray(ref_dist[:, 1]), atol=1e-5)


def test_fused_l2_top2_duplicate_descriptors():
    # exact duplicates: second-best distance must equal best (both ~0)
    q = jnp.eye(8, 64, dtype=jnp.float32)
    t = jnp.concatenate([q, q], axis=0)  # every query appears twice
    t_mask = jnp.ones((16,), bool)
    dist, idx = fused_l2_top2(q, t, t_mask, tile_q=8, tile_t=8, interpret=True)
    np.testing.assert_allclose(np.asarray(dist[:, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist[:, 1]), 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(8))


def test_match_descriptors_pallas_backend_agrees():
    from jax.experimental.pallas import tpu as pltpu

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.ops.matching import match_descriptors

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    q = jax.random.normal(k1, (200, 64))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = q[jnp.arange(200)[::-1]] + 0.03 * jax.random.normal(k2, (200, 64))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    d1 = Descriptors(data=q, mask=jnp.arange(200) < 190)
    d2 = Descriptors(data=t, mask=jnp.ones((200,), bool))

    ref = match_descriptors(d1, d2, MatcherConfig(backend="xla"))
    with pltpu.force_tpu_interpret_mode():
        out = match_descriptors(d1, d2, MatcherConfig(backend="pallas"))

    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(out.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(ref.train_idx)[m],
                                  np.asarray(out.train_idx)[m])
    np.testing.assert_allclose(np.asarray(ref.distance)[m],
                               np.asarray(out.distance)[m], atol=1e-5)


@pytest.mark.parametrize("n1,n2", [(256, 512), (100, 300)])
def test_fused_hamming_top2_matches_reference(n1, n2):
    from points_matching_tpu.ops.pallas.hamming import fused_hamming_top2

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    q = jax.random.randint(k1, (n1, 8), 0, 2**31 - 1).astype(jnp.uint32)
    t = jax.random.randint(k2, (n2, 8), 0, 2**31 - 1).astype(jnp.uint32)
    # plant exact duplicates so the 1-NN is unambiguous for some rows
    t = t.at[:50].set(q[:50])
    t_mask = jnp.arange(n2) < (n2 - 13)

    d1 = Descriptors(data=q, mask=jnp.ones((n1,), bool), binary=True)
    d2 = Descriptors(data=t, mask=t_mask, binary=True)
    ref_dist, ref_idx = knn_match(d1, d2, k=2, metric="hamming")

    out_dist, out_idx = fused_hamming_top2(q, t, t_mask, interpret=True)
    # distances must agree exactly (integer counts)
    np.testing.assert_array_equal(np.asarray(out_dist[:, 0]),
                                  np.asarray(ref_dist[:, 0], np.float32))
    np.testing.assert_array_equal(np.asarray(out_dist[:, 1]),
                                  np.asarray(ref_dist[:, 1], np.float32))
    # best index must agree wherever the minimum is unique
    unique = np.asarray(ref_dist[:, 0]) != np.asarray(ref_dist[:, 1])
    np.testing.assert_array_equal(np.asarray(out_idx[:, 0])[unique],
                                  np.asarray(ref_idx[:, 0])[unique])
    # planted duplicates: distance 0 at the planted index
    np.testing.assert_array_equal(np.asarray(out_dist[:50, 0]), 0.0)


def test_match_descriptors_pallas_hamming_backend_agrees():
    from jax.experimental.pallas import tpu as pltpu

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.ops.matching import match_descriptors

    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    q = jax.random.randint(k1, (128, 8), 0, 2**31 - 1).astype(jnp.uint32)
    # train = query with a few bit flips → realistic near-duplicates
    flips = (jax.random.uniform(k2, (128, 8)) < 0.02).astype(jnp.uint32)
    t = jnp.bitwise_xor(q, flips)
    d1 = Descriptors(data=q, mask=jnp.arange(128) < 120, binary=True)
    d2 = Descriptors(data=t, mask=jnp.ones((128,), bool), binary=True)

    cfg_ref = MatcherConfig(metric="hamming", filter="ratio", ratio=0.8,
                            backend="xla")
    cfg_pl = MatcherConfig(metric="hamming", filter="ratio", ratio=0.8,
                           backend="pallas")
    ref = match_descriptors(d1, d2, cfg_ref)
    with pltpu.force_tpu_interpret_mode():
        out = match_descriptors(d1, d2, cfg_pl)

    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(out.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(ref.train_idx)[m],
                                  np.asarray(out.train_idx)[m])
    np.testing.assert_allclose(np.asarray(ref.distance)[m],
                               np.asarray(out.distance)[m], atol=1e-5)


def test_fused_l2_top2_all_train_masked_out_but_some():
    q = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    t = jax.random.normal(jax.random.PRNGKey(2), (128, 64))
    t_mask = jnp.zeros((128,), bool).at[5].set(True)
    dist, idx = fused_l2_top2(q, t, t_mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.full(32, 5))
    assert np.all(np.asarray(dist[:, 1]) > 1e20)  # runner-up is the +inf pad
