"""Torch checkpoint -> Flax parameter-tree conversion.

Two use cases (SURVEY.md §7 "Pretrained encoders"):
  1. torchvision ImageNet ResNet weights -> our encoder init, including the
     multi-image first-conv channel averaging the reference applies when
     building the 6-channel pose encoder (reference:
     /root/reference/models/resnet_encoder.py:54-58).
  2. Reference training checkpoints (``dispnet_*.pth.tar`` /
     ``exp_pose_*.pth.tar`` state_dicts, /root/reference/utils.py:57-66) ->
     full DispNet / PoseNet variables, enabling eval parity runs against
     published models.

All functions take a plain ``{name: np.ndarray}`` mapping — load the torch
file with ``load_torch_state_dict`` (CPU, no CUDA needed).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .resnet import BOTTLENECK, STAGE_BLOCKS

Array = np.ndarray
Tree = Dict[str, Any]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a ``.pth``/``.pth.tar`` file into numpy arrays (handles the
    reference's ``{'epoch', 'state_dict'}`` wrapper)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _conv_kernel(w: Array) -> Array:
    """torch [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Tree, path: Tuple[str, ...], value: Array) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _convert_bn(
    sd: Mapping[str, Array], tprefix: str,
    params: Tree, stats: Tree, fpath: Tuple[str, ...],
) -> None:
    _set(params, fpath + ("bn", "scale"), sd[f"{tprefix}.weight"])
    _set(params, fpath + ("bn", "bias"), sd[f"{tprefix}.bias"])
    _set(stats, fpath + ("bn", "mean"), sd[f"{tprefix}.running_mean"])
    _set(stats, fpath + ("bn", "var"), sd[f"{tprefix}.running_var"])


def convert_resnet_encoder(
    sd: Mapping[str, Array],
    num_layers: int,
    torch_prefix: str = "",
    num_input_images: int = 1,
    average_conv1: bool = False,
) -> Tuple[Tree, Tree]:
    """Convert a torchvision-layout ResNet state_dict to our encoder tree.

    Args:
      sd: torch state_dict (numpy values).
      num_layers: 18/34/50/101/152.
      torch_prefix: key prefix in ``sd`` (e.g. ``"encoder.encoder."``).
      num_input_images: input-image multiplicity of the target encoder.
      average_conv1: if True, the source conv1 has 3 input channels and is
        tiled/averaged to ``3 * num_input_images`` (the reference's ImageNet
        trick); if False the source already has the right channel count.

    Returns:
      (params, batch_stats) trees for ``ResNetEncoder``.
    """
    p = torch_prefix
    params: Tree = {}
    stats: Tree = {}

    conv1 = sd[f"{p}conv1.weight"]
    if average_conv1 and num_input_images > 1:
        conv1 = np.concatenate([conv1] * num_input_images, axis=1) / num_input_images
    _set(params, ("conv1", "kernel"), _conv_kernel(conv1))
    _convert_bn(sd, f"{p}bn1", params, stats, ("bn1",))

    n_convs = 3 if BOTTLENECK[num_layers] else 2
    for stage, n_blocks in enumerate(STAGE_BLOCKS[num_layers], start=1):
        for i in range(n_blocks):
            tb = f"{p}layer{stage}.{i}"
            fb = f"layer{stage}_{i}"
            for j in range(1, n_convs + 1):
                _set(params, (fb, f"conv{j}", "kernel"),
                     _conv_kernel(sd[f"{tb}.conv{j}.weight"]))
                _convert_bn(sd, f"{tb}.bn{j}", params, stats, (fb, f"bn{j}"))
            if f"{tb}.downsample.0.weight" in sd:
                _set(params, (fb, "downsample_conv", "kernel"),
                     _conv_kernel(sd[f"{tb}.downsample.0.weight"]))
                _convert_bn(sd, f"{tb}.downsample.1", params, stats,
                            (fb, "downsample_bn"))

    return params, stats


# Reference DepthDecoder stores its convs in a ModuleList ordered
# [upconv_4_0, upconv_4_1, ..., upconv_0_1, dispconv_0..3]
# (/root/reference/models/DispResNet.py:65-82).
_DISP_DECODER_ORDER = [
    f"upconv_{i}_{j}" for i in range(4, -1, -1) for j in (0, 1)
] + [f"dispconv_{s}" for s in range(4)]


def convert_disp_checkpoint(sd: Mapping[str, Array], num_layers: int) -> Tree:
    """Reference DispResNet state_dict -> DispNet variables."""
    enc_params, enc_stats = convert_resnet_encoder(
        sd, num_layers, torch_prefix="encoder.encoder."
    )
    dec: Tree = {}
    for idx, name in enumerate(_DISP_DECODER_ORDER):
        # ConvBlock nests Conv3x3 as .conv (upconvs); dispconvs are bare Conv3x3.
        t = f"decoder.decoder.{idx}.conv.conv" if name.startswith("upconv") \
            else f"decoder.decoder.{idx}.conv"
        _set(dec, (name, "conv", "kernel"), _conv_kernel(sd[f"{t}.weight"]))
        _set(dec, (name, "conv", "bias"), sd[f"{t}.bias"])

    return {
        "params": {"encoder": enc_params, "decoder": dec},
        "batch_stats": {"encoder": enc_stats},
    }


def convert_pose_checkpoint(sd: Mapping[str, Array], num_layers: int = 18) -> Tree:
    """Reference PoseResNet state_dict -> PoseNet variables."""
    enc_params, enc_stats = convert_resnet_encoder(
        sd, num_layers, torch_prefix="encoder.encoder.", num_input_images=2
    )
    # decoder.net ModuleList order: [squeeze, pose_0, pose_1, pose_2]
    # (/root/reference/models/PoseResNet.py:25-33).
    dec: Tree = {}
    for idx, name in enumerate(["squeeze", "pose_0", "pose_1", "pose_2"]):
        t = f"decoder.net.{idx}"
        _set(dec, (name, "kernel"), _conv_kernel(sd[f"{t}.weight"]))
        _set(dec, (name, "bias"), sd[f"{t}.bias"])

    return {
        "params": {"encoder": enc_params, "decoder": dec},
        "batch_stats": {"encoder": enc_stats},
    }


def convert_imagenet_encoder(
    sd: Mapping[str, Array], num_layers: int, num_input_images: int = 1
) -> Tuple[Tree, Tree]:
    """torchvision ImageNet ResNet -> encoder init (multi-image averaging)."""
    return convert_resnet_encoder(
        sd, num_layers, torch_prefix="",
        num_input_images=num_input_images, average_conv1=True,
    )


# ---------------------------------------------------------------------------
# Export: Flax variables -> reference torch state_dict layout, so checkpoints
# trained here drop into the reference's tooling unchanged.
# ---------------------------------------------------------------------------


def _kernel_torch(k: Array) -> Array:
    """flax [kh, kw, I, O] -> torch [O, I, kh, kw]."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _export_bn(params: Tree, stats: Tree, tkey: str, out: Dict[str, Array]):
    out[f"{tkey}.weight"] = np.asarray(params["bn"]["scale"])
    out[f"{tkey}.bias"] = np.asarray(params["bn"]["bias"])
    out[f"{tkey}.running_mean"] = np.asarray(stats["bn"]["mean"])
    out[f"{tkey}.running_var"] = np.asarray(stats["bn"]["var"])
    out[f"{tkey}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_resnet_encoder(
    params: Tree, stats: Tree, num_layers: int, torch_prefix: str = ""
) -> Dict[str, Array]:
    p = torch_prefix
    out: Dict[str, Array] = {}
    out[f"{p}conv1.weight"] = _kernel_torch(params["conv1"]["kernel"])
    _export_bn(params["bn1"], stats["bn1"], f"{p}bn1", out)

    n_convs = 3 if BOTTLENECK[num_layers] else 2
    for stage, n_blocks in enumerate(STAGE_BLOCKS[num_layers], start=1):
        for i in range(n_blocks):
            fb = f"layer{stage}_{i}"
            tb = f"{p}layer{stage}.{i}"
            for j in range(1, n_convs + 1):
                out[f"{tb}.conv{j}.weight"] = _kernel_torch(
                    params[fb][f"conv{j}"]["kernel"]
                )
                _export_bn(params[fb][f"bn{j}"], stats[fb][f"bn{j}"],
                           f"{tb}.bn{j}", out)
            if "downsample_conv" in params[fb]:
                out[f"{tb}.downsample.0.weight"] = _kernel_torch(
                    params[fb]["downsample_conv"]["kernel"]
                )
                _export_bn(params[fb]["downsample_bn"],
                           stats[fb]["downsample_bn"],
                           f"{tb}.downsample.1", out)
    return out


def export_disp_checkpoint(variables: Tree, num_layers: int) -> Dict[str, Array]:
    """DispNet variables -> reference DispResNet state_dict."""
    out = export_resnet_encoder(
        variables["params"]["encoder"], variables["batch_stats"]["encoder"],
        num_layers, torch_prefix="encoder.encoder.",
    )
    dec_p = variables["params"]["decoder"]
    for idx, name in enumerate(_DISP_DECODER_ORDER):
        t = f"decoder.decoder.{idx}.conv.conv" if name.startswith("upconv") \
            else f"decoder.decoder.{idx}.conv"
        out[f"{t}.weight"] = _kernel_torch(dec_p[name]["conv"]["kernel"])
        out[f"{t}.bias"] = np.asarray(dec_p[name]["conv"]["bias"])
    return out


def export_pose_checkpoint(variables: Tree, num_layers: int = 18) -> Dict[str, Array]:
    """PoseNet variables -> reference PoseResNet state_dict."""
    out = export_resnet_encoder(
        variables["params"]["encoder"], variables["batch_stats"]["encoder"],
        num_layers, torch_prefix="encoder.encoder.",
    )
    dec_p = variables["params"]["decoder"]
    for idx, name in enumerate(["squeeze", "pose_0", "pose_1", "pose_2"]):
        out[f"decoder.net.{idx}.weight"] = _kernel_torch(dec_p[name]["kernel"])
        out[f"decoder.net.{idx}.bias"] = np.asarray(dec_p[name]["bias"])
    return out


def save_torch_checkpoint(state_dict: Dict[str, Array], path: str,
                          epoch: int = 0) -> None:
    """Write a reference-format ``{'epoch', 'state_dict'}`` .pth.tar."""
    import torch

    tensors = {k: torch.tensor(v) for k, v in state_dict.items()}
    torch.save({"epoch": epoch, "state_dict": tensors}, path)


def graft_imagenet_encoder(
    variables: Tree,
    sd: Mapping[str, Array],
    num_layers: int,
    num_input_images: int = 1,
) -> Tree:
    """Replace the encoder of freshly-initialized net variables with
    converted torchvision ImageNet weights (decoders keep their random
    init), reproducing the reference's pretrained-encoder setup
    (/root/reference/models/resnet_encoder.py:54-58)."""
    enc_params, enc_stats = convert_imagenet_encoder(
        sd, num_layers, num_input_images
    )
    variables = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables.get("batch_stats", {})),
    }
    variables["params"]["encoder"] = enc_params
    variables["batch_stats"]["encoder"] = enc_stats
    return variables
