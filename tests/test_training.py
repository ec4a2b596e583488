"""End-to-end training-step tests: single device, overfit trend, sharded
multi-device execution, and checkpoint round-trip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
from sc_sfmlearner_release_tpu.parallel import make_mesh, replicate, shard_batch
from sc_sfmlearner_release_tpu.training import (
    LossConfig,
    TrainState,
    create_train_state,
    make_eval_depth_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
    restore_train_state,
    save_checkpoint,
)

B, N, H, W = 2, 2, 32, 64


def _models():
    return DispNet(num_layers=18), PoseNet(num_layers=18)


def _synthetic_batch(b=B, seed=0):
    """A tiny translating-camera scene: shifted crops of a textured image."""
    rng = np.random.RandomState(seed)
    base = rng.rand(H + 8, W + 8, 3).astype(np.float32)
    tgt = np.stack([base[4 : 4 + H, 4 : 4 + W] for _ in range(b)])
    refs = np.stack(
        [
            np.stack([base[4 : 4 + H, 2 : 2 + W], base[4 : 4 + H, 6 : 6 + W]])
            for _ in range(b)
        ]
    )
    k = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    return {
        "tgt": jnp.asarray(tgt),
        "refs": jnp.asarray(refs),
        "intrinsics": jnp.asarray(np.broadcast_to(k, (b, 3, 3))),
    }


def _state(tx):
    disp, pose = _models()
    return create_train_state(
        disp, pose, tx, jax.random.PRNGKey(0), image_shape=(1, H, W, 3)
    )


def test_train_step_runs_and_loss_decreases():
    disp, pose = _models()
    tx = make_optimizer(lr=1e-3)
    state = _state(tx)
    step = make_train_step(disp, pose, tx, LossConfig())
    batch = _synthetic_batch()

    import jax as _jax

    params_before = _jax.tree_util.tree_map(np.asarray, state.params)

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8

    # gradients must reach BOTH networks through the warp
    for net in ("disp", "pose"):
        before = _jax.tree_util.tree_leaves(params_before[net])
        after = _jax.tree_util.tree_leaves(
            _jax.tree_util.tree_map(np.asarray, state.params[net])
        )
        changed = sum(
            not np.allclose(a, b) for a, b in zip(after, before)
        )
        assert changed > len(before) * 0.9, f"{net} params mostly unchanged"


def test_eval_steps():
    disp, pose = _models()
    tx = make_optimizer()
    state = _state(tx)

    eval_step = make_eval_step(disp, pose, LossConfig())
    metrics = eval_step(state, _synthetic_batch())
    assert np.isfinite(float(metrics["photo_loss"]))

    eval_depth = make_eval_depth_step(disp, dataset="nyu")
    rng = np.random.RandomState(3)
    batch = {
        "img": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "depth": jnp.asarray((1 + rng.rand(B, H, W) * 5).astype(np.float32)),
    }
    errors = eval_depth(state, batch)
    assert np.isfinite(float(errors["abs_rel"]))
    assert 0.0 <= float(errors["a1"]) <= 1.0


@pytest.mark.slow
@pytest.mark.fullopt
def test_train_step_sharded_over_mesh():
    """The same jitted step over an 8-device data mesh: batch sharded,
    state replicated, results identical semantics (global batch)."""
    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh(devices)

    disp, pose = _models()
    tx = make_optimizer(lr=1e-3)
    state = replicate(_state(tx), mesh)
    step = make_train_step(disp, pose, tx, LossConfig())

    batch = shard_batch(
        {k: np.asarray(v) for k, v in _synthetic_batch(b=8).items()}, mesh
    )
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    state, metrics2 = step(state, batch)
    assert float(metrics2["loss"]) < float(metrics["loss"]) * 1.5  # sane trend


def test_checkpoint_roundtrip():
    disp, pose = _models()
    tx = make_optimizer(lr=1e-3)
    state = _state(tx)
    step = make_train_step(disp, pose, tx, LossConfig())
    state, _ = step(state, _synthetic_batch())

    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, state, is_best=True, epoch=1)
        assert os.path.exists(os.path.join(d, "dispnet_checkpoint.msgpack"))
        assert os.path.exists(os.path.join(d, "dispnet_model_best.msgpack"))
        assert os.path.exists(os.path.join(d, "exp_pose_model_best.msgpack"))

        template = _state(tx)
        restored = restore_train_state(d, template)
        assert int(restored.step) == int(state.step)
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # Restored state continues training.
        restored, metrics = step(restored, _synthetic_batch())
        assert np.isfinite(float(metrics["loss"]))


def test_orbax_checkpoint_roundtrip():
    from sc_sfmlearner_release_tpu.training import OrbaxCheckpointManager

    disp, pose = _models()
    tx = make_optimizer(lr=1e-3)
    state = _state(tx)

    with tempfile.TemporaryDirectory() as d:
        mgr = OrbaxCheckpointManager(d, max_to_keep=2)
        mgr.save(0, state)
        mgr.save(1, state.replace(step=state.step + 1))
        assert mgr.latest_step() == 1

        restored = mgr.restore(_state(tx))
        assert int(restored.step) == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()


def test_fused_steps_match_sequential():
    """fused_steps=K (one lax.scan dispatch) == K sequential unfused steps:
    same final params, same per-step metrics."""
    K = 3
    disp, pose = _models()
    tx = make_optimizer(lr=1e-3)
    cfg = LossConfig()

    step1 = make_train_step(disp, pose, tx, cfg)
    stepK = make_train_step(disp, pose, tx, cfg, fused_steps=K)

    batches = [_synthetic_batch(seed=s) for s in range(K)]
    stacked = {
        k: jnp.stack([b[k] for b in batches]) for k in batches[0]
    }

    state_seq = _state(tx)
    seq_losses = []
    for b in batches:
        state_seq, m = step1(state_seq, b)
        seq_losses.append(float(m["loss"]))

    state_fused = _state(tx)
    state_fused, mK = stepK(state_fused, stacked)

    assert int(state_fused.step) == K
    np.testing.assert_allclose(
        np.asarray(mK["loss"]), np.asarray(seq_losses), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_fused.params),
        jax.tree_util.tree_leaves(state_seq.params),
    ):
        # The scanned and unfused programs fuse/reduce in different orders;
        # Adam's m/(sqrt(v)+eps) amplifies those ulp-level grad differences
        # where v ~ 0, so params agree to ~1e-5 abs after K steps, not 1e-6.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5
        )


@pytest.mark.slow
@pytest.mark.fullopt
def test_fused_steps_sharded_over_mesh():
    """Fused scan composes with the data mesh: stacked batches shard on
    axis 1, the scan axis replicates."""
    devices = jax.devices()
    mesh = make_mesh(devices)
    disp, pose = _models()
    tx = make_optimizer(lr=1e-3)
    state = replicate(_state(tx), mesh)
    stepK = make_train_step(disp, pose, tx, LossConfig(), fused_steps=2)

    batches = [
        {k: np.asarray(v) for k, v in _synthetic_batch(b=8, seed=s).items()}
        for s in range(2)
    ]
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    sharded = shard_batch(stacked, mesh, stacked=True)

    state, metrics = stepK(state, sharded)
    assert metrics["loss"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    assert int(state.step) == 2


def test_train_step_sequence_length_5():
    """4 reference frames (sequence-length 5) flow through the fused step."""
    disp, pose = _models()
    tx = make_optimizer(lr=1e-3)
    state = _state(tx)
    step = make_train_step(disp, pose, tx, LossConfig())

    rng = np.random.RandomState(9)
    k = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    batch = {
        "tgt": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "refs": jnp.asarray(rng.rand(B, 4, H, W, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(np.broadcast_to(k, (B, 3, 3))),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
