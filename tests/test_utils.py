"""Checkpoint/resume and profiling subsystem tests (SURVEY.md §5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from points_matching_tpu.utils.checkpoint import CheckpointManager
from points_matching_tpu.utils.profiling import chip_peaks, roofline


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "X": jnp.arange(12.0).reshape(4, 3),
        "mask": jnp.asarray([True, False, True, True]),
        "step": jnp.asarray(7, jnp.int32),
    }
    with CheckpointManager(str(tmp_path / "ckpt")) as mgr:
        assert mgr.save(0, state)
        mgr.wait()
        state2 = jax.tree.map(lambda a: a * 2, state)
        assert mgr.save(1, state2)
        mgr.wait()
        assert mgr.latest_step() == 1
        restored = mgr.restore(1, template=state)
        np.testing.assert_allclose(np.asarray(restored["X"]),
                                   np.asarray(state2["X"]))
        restored0 = mgr.restore(0, template=state)
        np.testing.assert_allclose(np.asarray(restored0["X"]),
                                   np.asarray(state["X"]))


def test_checkpoint_restore_sharded(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from points_matching_tpu.parallel import make_mesh
    from points_matching_tpu.parallel.mesh import MODEL_AXIS

    mesh = make_mesh((8,), (MODEL_AXIS,))
    x = jax.device_put(jnp.arange(64.0).reshape(16, 4),
                       NamedSharding(mesh, P(MODEL_AXIS)))
    state = {"X": x}
    with CheckpointManager(str(tmp_path / "ckpt")) as mgr:
        mgr.save(0, state)
        mgr.wait()
        restored = mgr.restore(0, template=state)
    assert restored["X"].sharding == x.sharding
    np.testing.assert_allclose(np.asarray(restored["X"]), np.asarray(x))


def test_checkpoint_restore_missing_raises(tmp_path):
    with CheckpointManager(str(tmp_path / "empty")) as mgr:
        with pytest.raises(FileNotFoundError):
            mgr.restore()


def test_roofline_report_runs():
    def f(a, b):
        return a @ b

    a = jnp.ones((512, 512))
    b = jnp.ones((512, 512))
    rep = roofline(f, a, b, iters=3)
    assert rep.wall_s > 0
    assert rep.peak_tflops > 0
    # XLA reports flops for a matmul on every backend we test on
    if rep.flops is not None:
        assert rep.flops >= 2 * 512**3 * 0.5
    str(rep)  # formats without crashing


def test_chip_peaks_known():
    peaks = chip_peaks()
    assert peaks["flops"] > 0 and peaks["hbm_gbps"] > 0
