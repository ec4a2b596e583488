"""ImageNet encoder grafting: torchvision weights into fresh net variables,
including the multi-image first-conv averaging for the 6-channel pose
encoder (reference: resnet_encoder.py:54-58)."""

import jax
import jax.numpy as jnp
import numpy as np

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
from sc_sfmlearner_release_tpu.models.convert import graft_imagenet_encoder
from torch_mirror import TorchEncoder


def _imagenet_sd():
    """A torchvision-layout single-image r18 state_dict (random weights)."""
    enc = TorchEncoder(18, 1)
    return {k: v.detach().numpy() for k, v in enc.state_dict().items()}


def test_graft_disp_encoder():
    model = DispNet(num_layers=18)
    x = jnp.zeros((1, 64, 64, 3))
    init = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), x
    )
    sd = _imagenet_sd()
    variables = graft_imagenet_encoder(dict(init), sd, 18, 1)

    got = np.asarray(variables["params"]["encoder"]["conv1"]["kernel"])
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)

    # decoder keeps its random init
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["decoder"]["dispconv_0"]["conv"]["kernel"]),
        np.asarray(init["params"]["decoder"]["dispconv_0"]["conv"]["kernel"]),
    )

    # grafted variables run
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out[0].shape == (1, 64, 64, 1)


def test_graft_pose_encoder_averages_conv1():
    model = PoseNet(num_layers=18)
    x = jnp.zeros((1, 64, 64, 3))
    init = jax.jit(lambda k, x: model.init(k, x, x, train=True))(
        jax.random.PRNGKey(0), x
    )
    sd = _imagenet_sd()
    variables = graft_imagenet_encoder(dict(init), sd, 18, 2)

    got = np.asarray(variables["params"]["encoder"]["conv1"]["kernel"])
    assert got.shape == (7, 7, 6, 64)  # 2-image input
    single = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got[:, :, :3], single / 2.0, rtol=1e-6)
    np.testing.assert_allclose(got[:, :, 3:], single / 2.0, rtol=1e-6)

    pose = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
        variables, x, x
    )
    assert pose.shape == (1, 6)
