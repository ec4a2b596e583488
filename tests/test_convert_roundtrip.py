"""Checkpoint conversion round-trips: torch -> flax -> torch is lossless."""

import numpy as np
import pytest
import torch

from sc_sfmlearner_release_tpu.models.convert import (
    convert_disp_checkpoint,
    convert_pose_checkpoint,
    export_disp_checkpoint,
    export_pose_checkpoint,
)
from torch_mirror import TorchDispNet, TorchPoseNet, randomize_bn_stats


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("num_layers", [18, 50])
def test_disp_roundtrip(num_layers):
    tnet = TorchDispNet(num_layers).eval()
    randomize_bn_stats(tnet, seed=4)
    sd = _np_sd(tnet)

    variables = convert_disp_checkpoint(sd, num_layers)
    back = export_disp_checkpoint(variables, num_layers)

    for k, v in sd.items():
        assert k in back, f"missing key {k}"
        np.testing.assert_array_equal(np.asarray(back[k]), v, err_msg=k)


def test_pose_roundtrip():
    tnet = TorchPoseNet(18).eval()
    randomize_bn_stats(tnet, seed=5)
    sd = _np_sd(tnet)

    variables = convert_pose_checkpoint(sd, 18)
    back = export_pose_checkpoint(variables, 18)

    for k, v in sd.items():
        assert k in back, f"missing key {k}"
        np.testing.assert_array_equal(np.asarray(back[k]), v, err_msg=k)


def test_exported_checkpoint_loads_into_torch(tmp_path):
    """A full save->load cycle through the reference's torch format."""
    from sc_sfmlearner_release_tpu.models.convert import (
        load_torch_state_dict,
        save_torch_checkpoint,
    )

    tnet = TorchPoseNet(18).eval()
    sd = _np_sd(tnet)
    variables = convert_pose_checkpoint(sd, 18)
    out = tmp_path / "exp_pose_checkpoint.pth.tar"
    save_torch_checkpoint(export_pose_checkpoint(variables, 18), str(out), epoch=7)

    blob = torch.load(out, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 7
    tnet.load_state_dict(blob["state_dict"])  # strict load must succeed

    again = load_torch_state_dict(str(out))
    np.testing.assert_array_equal(
        again["decoder.net.0.weight"], sd["decoder.net.0.weight"]
    )
