"""2-D (data x spatial) mesh: image width shards over a second mesh axis.

The reference has no model-parallel axis (SURVEY.md §5.7 — DataParallel
only, /root/reference/train.py:168-169). Here GSPMD partitions the conv
feature maps along W (halo exchanges inserted by XLA), so one image can
span several chips. These tests check the spatially sharded step computes
the SAME global result as the data-parallel-only step.
"""

import jax
import numpy as np
import pytest

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
from sc_sfmlearner_release_tpu.parallel import (
    SPATIAL_AXIS,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
)
from sc_sfmlearner_release_tpu.training import (
    LossConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)

B, N, H, W = 8, 2, 32, 64


def _batch(b=B, seed=0):
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
        "tgt": tgt,
        "refs": refs,
        "intrinsics": np.broadcast_to(k, (b, 3, 3)).copy(),
    }


def test_make_mesh_2d_shape():
    mesh = make_mesh_2d(2, jax.devices())
    assert mesh.shape == {"data": 4, "spatial": 2}
    try:
        make_mesh_2d(3, jax.devices())
    except ValueError:
        pass
    else:
        raise AssertionError("spatial=3 over 8 devices should raise")


def test_spatial_sharding_places_width_axis():
    mesh = make_mesh_2d(2, jax.devices())
    sharded = shard_batch(_batch(), mesh)
    tgt_spec = sharded["tgt"].sharding.spec
    assert tgt_spec[0] == "data" and tgt_spec[2] == SPATIAL_AXIS
    refs_spec = sharded["refs"].sharding.spec
    assert refs_spec[0] == "data" and refs_spec[3] == SPATIAL_AXIS
    k_spec = sharded["intrinsics"].sharding.spec
    assert k_spec[0] == "data" and all(s is None for s in k_spec[1:])


@pytest.mark.slow
@pytest.mark.fullopt
def test_spatial_step_matches_data_parallel():
    """One train step on data(8) vs data(4) x spatial(2): same global math,
    so losses and updated params must agree to numerical tolerance."""
    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 virtual CPU devices"

    disp = DispNet(num_layers=18)
    pose = PoseNet(num_layers=18)
    tx = make_optimizer(lr=1e-3)
    step = make_train_step(disp, pose, tx, LossConfig())
    batch = _batch()

    def run(mesh):
        state = create_train_state(
            disp, pose, tx, jax.random.PRNGKey(0), image_shape=(1, H, W, 3)
        )
        state = replicate(state, mesh)
        state, metrics = step(state, shard_batch(batch, mesh))
        return state, {k: float(v) for k, v in metrics.items()}

    _, m_dp = run(make_mesh(devices))
    state_sp, m_sp = run(make_mesh_2d(2, devices))

    for k in m_dp:
        assert np.isfinite(m_sp[k])
        np.testing.assert_allclose(m_sp[k], m_dp[k], rtol=2e-4, err_msg=k)

    # the spatially sharded state keeps training
    state_sp, metrics2 = step(state_sp, shard_batch(batch, make_mesh_2d(2, devices)))
    assert np.isfinite(float(metrics2["loss"]))
