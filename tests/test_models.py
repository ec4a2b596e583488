"""Model parity tests: Flax DispNet/PoseNet vs a torch mirror with converted
weights (eval mode, randomized BN stats). Verifies both the architectures and
the checkpoint converter (models/convert.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet, ResNetEncoder
from sc_sfmlearner_release_tpu.models.convert import (
    convert_disp_checkpoint,
    convert_pose_checkpoint,
    convert_resnet_encoder,
)
from torch_mirror import (
    TorchDispNet,
    TorchEncoder,
    TorchPoseNet,
    randomize_bn_stats,
)

B, H, W = 2, 64, 96


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_disp_net_shapes_and_range():
    model = DispNet(num_layers=18)
    x = jnp.zeros((B, H, W, 3))
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), x
    )
    disps = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)[0]
    assert len(disps) == 4
    for s, d in enumerate(disps):
        assert d.shape == (B, H // (2**s), W // (2**s), 1)
        assert float(d.min()) >= 0.01 and float(d.max()) <= 10.01


def test_pose_net_shape():
    model = PoseNet(num_layers=18)
    x = jnp.zeros((B, H, W, 3))
    variables = jax.jit(lambda k, x: model.init(k, x, x, train=True))(
        jax.random.PRNGKey(0), x
    )
    pose = jax.jit(lambda v, x: model.apply(v, x, x, train=False))(variables, x)
    assert pose.shape == (B, 6)


@pytest.mark.parametrize("num_layers", [18, 50])
def test_encoder_matches_torch(num_layers):
    tenc = TorchEncoder(num_layers, 1).eval()
    randomize_bn_stats(tenc, seed=1)
    params, stats = convert_resnet_encoder(_np_sd(tenc), num_layers)

    enc = ResNetEncoder(num_layers=num_layers)
    rng = np.random.RandomState(0)
    x = rng.rand(B, H, W, 3).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        feats = jax.jit(lambda v, x: enc.apply(v, x, train=False))(
            {"params": params, "batch_stats": stats}, jnp.asarray(x)
        )
    with torch.no_grad():
        tfeats = tenc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    assert len(feats) == len(tfeats) == 5
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(
            np.asarray(f), _nhwc(tf), rtol=1e-3, atol=1e-4
        )


def test_disp_net_matches_torch_via_checkpoint_conversion():
    tnet = TorchDispNet(18).eval()
    randomize_bn_stats(tnet, seed=2)
    variables = convert_disp_checkpoint(_np_sd(tnet), num_layers=18)

    rng = np.random.RandomState(1)
    x = rng.rand(B, H, W, 3).astype(np.float32)

    model = DispNet(num_layers=18)
    with jax.default_matmul_precision("highest"):
        disps = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x)
        )
    with torch.no_grad():
        tdisps = tnet(torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    for d, td in zip(disps, tdisps):
        np.testing.assert_allclose(np.asarray(d), _nhwc(td), rtol=1e-3, atol=1e-4)


def test_pose_net_matches_torch_via_checkpoint_conversion():
    tnet = TorchPoseNet(18).eval()
    randomize_bn_stats(tnet, seed=3)
    variables = convert_pose_checkpoint(_np_sd(tnet), num_layers=18)

    rng = np.random.RandomState(2)
    x1 = rng.rand(B, H, W, 3).astype(np.float32)
    x2 = rng.rand(B, H, W, 3).astype(np.float32)

    model = PoseNet(num_layers=18)
    with jax.default_matmul_precision("highest"):
        pose = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
            variables, jnp.asarray(x1), jnp.asarray(x2)
        )
    with torch.no_grad():
        tpose = tnet(
            torch.tensor(np.transpose(x1, (0, 3, 1, 2))),
            torch.tensor(np.transpose(x2, (0, 3, 1, 2))),
        )
    np.testing.assert_allclose(np.asarray(pose), tpose.numpy(), rtol=1e-3, atol=1e-5)


def test_batch_stats_update_in_train_mode():
    model = DispNet(num_layers=18)
    x = jnp.ones((B, H, W, 3)) * 0.3
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), x
    )
    _, mutated = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before)
    )
