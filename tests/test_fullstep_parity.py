"""FULL-STEP numerical parity vs the reference training math.

The strongest offline Eigen-parity proxy available without the KITTI
dataset: both networks + the complete composed training computation
(batched warp -> SSIM -> auto/validity/self-discovered masks -> 3-term
weighted loss) and its PARAMETER GRADIENTS are checked against an
independent torch implementation of the reference math
(/root/reference/loss_functions.py:50-159, inverse_warp.py:194-269,
train.py:249-297) on identical fp32 inputs and identical weights.

Weights flow torch -> flax through the production converter
(models/convert.py), and torch gradients flow back through the SAME
converter (conversion is transpose/reshape only, hence grad-transparent),
so a mismatch anywhere — models, converter, geometry, losses, autodiff —
fails the assertion.

BN runs in eval mode on both sides: the reference computes depth/pose in
separate per-frame forwards while this framework folds frames into one
batched call, so train-mode batch statistics legitimately differ by design
(sync-BN semantics, docs/DESIGN.md); eval-mode BN is an affine map and
makes every remaining operation comparable bit-for-bit-ish (<=1e-4 rel).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
from sc_sfmlearner_release_tpu.models.convert import (
    convert_disp_checkpoint,
    convert_pose_checkpoint,
)
from sc_sfmlearner_release_tpu.training.step import LossConfig, _total_loss

import torch_losses as TL
from torch_mirror import TorchDispNet, TorchPoseNet, randomize_bn_stats

# Shapes sized so BOTH masked means clear the reference's >10000-element
# guard even under the auto-mask (which keeps ~50% of random-noise pixels):
# geometry diff is single-channel, so B*H*W*0.5 = 12288 > 10000.
B, N, H, W = 4, 2, 64, 96


def _make_batch(seed=0):
    rng = np.random.RandomState(seed)
    tgt = rng.rand(B, H, W, 3).astype(np.float32)
    refs = rng.rand(B, N, H, W, 3).astype(np.float32)
    k = np.array([[50.0, 0, W / 2], [0, 55.0, H / 2], [0, 0, 1]], np.float32)
    intrinsics = np.broadcast_to(k, (B, 3, 3)).copy()
    return {"tgt": tgt, "refs": refs, "intrinsics": intrinsics}


def _nets(seed=0):
    """Torch nets (random weights + non-trivial BN stats) and the flax
    variables converted from them through the production converter."""
    torch.manual_seed(seed)
    tdisp = TorchDispNet(18).eval()
    tpose = TorchPoseNet(18).eval()
    randomize_bn_stats(tdisp, seed)
    randomize_bn_stats(tpose, seed + 1)
    dv = convert_disp_checkpoint(
        {k: v.detach().numpy() for k, v in tdisp.state_dict().items()}, 18
    )
    pv = convert_pose_checkpoint(
        {k: v.detach().numpy() for k, v in tpose.state_dict().items()}, 18
    )
    return tdisp, tpose, dv, pv


def _torch_reference_step(tdisp, tpose, batch, cfg: LossConfig, x64=False):
    """The reference train step's loss on torch: per-frame depth forwards,
    2N directed pose forwards, 3-term weighted loss (train.py:249-297,
    426-444). Returns (metrics dict, grads state-dict-like)."""
    if x64:
        tdisp, tpose = tdisp.double(), tpose.double()
    cast = (lambda a: a.astype(np.float64)) if x64 else (lambda a: a)
    to_nchw = lambda a: torch.from_numpy(cast(np.asarray(a))).permute(0, 3, 1, 2)
    tgt = to_nchw(batch["tgt"]).requires_grad_(False)
    refs = [to_nchw(batch["refs"][:, i]) for i in range(N)]
    K = torch.from_numpy(cast(batch["intrinsics"]))

    tgt_depth = [1.0 / d for d in tdisp(tgt)]
    ref_depths = [[1.0 / d for d in tdisp(r)] for r in refs]
    poses = [tpose(tgt, r) for r in refs]
    poses_inv = [tpose(r, tgt) for r in refs]

    photo, geom = TL.photometric_geometry_loss(
        tgt, refs, K, tgt_depth, ref_depths, poses, poses_inv,
        max_scales=cfg.num_scales, with_ssim=cfg.with_ssim,
        with_mask=cfg.with_mask, with_auto_mask=cfg.with_auto_mask,
        padding_mode=cfg.padding_mode,
    )
    smooth = TL.edge_smooth_loss(tgt_depth, tgt, ref_depths, refs)
    total = (cfg.photo_weight * photo + cfg.smooth_weight * smooth
             + cfg.geometry_weight * geom)

    tdisp.zero_grad(set_to_none=True)
    tpose.zero_grad(set_to_none=True)
    total.backward()

    def grad_sd(net):
        out = {}
        for k, p in net.named_parameters():
            out[k] = (p.grad if p.grad is not None
                      else torch.zeros_like(p)).numpy()
        for k, b in net.named_buffers():  # converter wants BN stats keys
            out[k] = np.zeros_like(b.numpy())
        return out

    metrics = {
        "loss": float(total), "photo_loss": float(photo),
        "smooth_loss": float(smooth), "geometry_loss": float(geom),
    }
    return metrics, grad_sd(tdisp), grad_sd(tpose)


def _jax_step(dv, pv, batch, cfg: LossConfig, x64=False):
    import contextlib

    ctx = jax.enable_x64(True) if x64 else contextlib.nullcontext()
    dtype = jnp.float64 if x64 else jnp.float32
    with ctx:
        disp_model = DispNet(num_layers=18, dtype=dtype)
        pose_model = PoseNet(num_layers=18, dtype=dtype)
        up = lambda t: jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64 if x64 else np.float32), t
        )
        params = up({"disp": dv["params"], "pose": pv["params"]})
        stats = up({"disp": dv["batch_stats"], "pose": pv["batch_stats"]})
        jbatch = {k: jnp.asarray(up(v)) for k, v in batch.items()}

        def loss_of(p):
            total, (metrics, _) = _total_loss(
                disp_model, pose_model, p, stats, jbatch, cfg, train=False
            )
            return total, metrics

        (_, metrics), grads = jax.jit(
            jax.value_and_grad(loss_of, has_aux=True)
        )(params)
        return jax.device_get(metrics), jax.device_get(grads)


def _assert_tree_close(jax_tree, torch_tree, rtol, what):
    flat_j = jax.tree_util.tree_leaves_with_path(jax_tree)
    flat_t = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(torch_tree)
    )
    assert flat_j, f"empty tree for {what}"
    # Absolute floor scaled by the NET-WIDE gradient magnitude: both sides
    # are fp32 with different reduction orders, so components orders of
    # magnitude below the net's gradient scale carry relative noise ~1e-3;
    # what matters for training parity is relative accuracy of significant
    # components plus absolute accuracy of negligible ones.
    net_scale = max(np.abs(v).max() for v in flat_t.values())
    for path, jv in flat_j:
        key = jax.tree_util.keystr(path)
        tv = flat_t[key]
        np.testing.assert_allclose(
            np.asarray(jv), tv, rtol=rtol, atol=rtol * net_scale,
            err_msg=f"{what}{key}",
        )


@pytest.mark.slow
@pytest.mark.parametrize(
    "cfg",
    [
        # canonical KITTI config (scripts/train_resnet18_depth_256.sh).
        # The other loss branches (multi-scale, no-ssim, no-auto-mask) are
        # covered by the fp32 parametrization below — one fp64 case costs
        # ~8 min of XLA:CPU compile on 1 CPU and the second bought no
        # additional math coverage fp32 can't see at its looser bound.
        LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                   with_auto_mask=True),
    ],
    ids=["canonical"],
)
def test_fullstep_loss_and_grads_match_reference(cfg):
    """fp64 on both sides: rounding is negligible, so <=1e-4 rel truly
    tests the MATH (any op/mask/gradient discrepancy fails loudly)."""
    batch = _make_batch()
    tdisp, tpose, dv, pv = _nets()

    t_metrics, t_disp_grads, t_pose_grads = _torch_reference_step(
        tdisp, tpose, batch, cfg, x64=True
    )
    j_metrics, j_grads = _jax_step(dv, pv, batch, cfg, x64=True)

    # losses match to <=1e-4 relative
    for k in ("loss", "photo_loss", "smooth_loss", "geometry_loss"):
        np.testing.assert_allclose(
            float(j_metrics[k]), t_metrics[k], rtol=1e-4, err_msg=k
        )

    # parameter gradients match: convert the torch grads through the same
    # (linear) converter and compare the params subtree leaf by leaf
    t_disp_tree = convert_disp_checkpoint(t_disp_grads, 18)["params"]
    t_pose_tree = convert_pose_checkpoint(t_pose_grads, 18)["params"]
    _assert_tree_close(j_grads["disp"], t_disp_tree, 1e-4, "disp grad ")
    _assert_tree_close(j_grads["pose"], t_pose_tree, 1e-4, "pose grad ")


@pytest.mark.slow
@pytest.mark.parametrize(
    "scales,ssim,auto_mask,sampler,loss_rtol,grad_rtol",
    [
        # gather: torch-exact sampler — the bound is the observed fp32
        # reduction-order noise envelope (~4e-4 rel on the largest grads).
        (1, True, True, "gather", 5e-4, 2e-3),
        # multi-scale + no auto-mask + no ssim exercises the other loss
        # branches (was an fp64 case; fp32 bounds suffice for these).
        (3, False, False, "gather", 5e-4, 2e-3),
        # band64: the 1-D banded TPU sampler (ops/warp_band.py). Image
        # values ride bf16 channels (~4e-3 abs on [0,1] images; sampled
        # depth recombines to fp32 via hi/lo splitting), so the envelope
        # vs the torch oracle is the op-level band-vs-gather bound
        # (tests/test_warp_band.py) composed through the loss.
        (1, True, True, "band64", 5e-3, 3e-2),
        # the PRODUCTION TPU sampler family (train.py --sampler auto =
        # band80r16x368c208l192): 2-D column banding + the fallback ladder,
        # held to the same end-to-end torch assertion. Windows scale to
        # the 96x64 test shape (x416 would degrade to 1-D at W=96 and
        # test nothing) — same code path, same budget-to-image ratios.
        (1, True, True, "band32x48c24l64", 5e-3, 3e-2),
    ],
    ids=["canonical-gather", "multiscale-gather", "canonical-band64",
         "canonical-band2d-ladder"],
)
def test_fullstep_fp32_production_dtype_close(
    scales, ssim, auto_mask, sampler, loss_rtol, grad_rtol
):
    """Full-step loss+grad parity at the production fp32 dtype, for BOTH the
    torch-exact gather sampler and the shipped band64 MXU sampler — the
    band64 case holds the production math to the same end-to-end assertion
    as gather (the math we ship IS the math we prove)."""
    cfg = LossConfig(num_scales=scales, with_ssim=ssim, with_mask=True,
                     with_auto_mask=auto_mask, sampler=sampler)
    batch = _make_batch()
    tdisp, tpose, dv, pv = _nets()
    t_metrics, t_disp_grads, t_pose_grads = _torch_reference_step(
        tdisp, tpose, batch, dataclasses.replace(cfg, sampler="gather")
    )
    j_metrics, j_grads = _jax_step(dv, pv, batch, cfg)
    for k in ("loss", "photo_loss", "smooth_loss", "geometry_loss"):
        np.testing.assert_allclose(
            float(j_metrics[k]), t_metrics[k], rtol=loss_rtol, err_msg=k
        )
    t_disp_tree = convert_disp_checkpoint(t_disp_grads, 18)["params"]
    t_pose_tree = convert_pose_checkpoint(t_pose_grads, 18)["params"]
    _assert_tree_close(j_grads["disp"], t_disp_tree, grad_rtol, "disp grad ")
    _assert_tree_close(j_grads["pose"], t_pose_tree, grad_rtol, "pose grad ")


@pytest.mark.slow
def test_fullstep_loss_nonzero_and_finite():
    """Guard against a degenerate pass (e.g. everything masked to zero)."""
    cfg = LossConfig(num_scales=1, with_auto_mask=True)
    batch = _make_batch()
    _, _, dv, pv = _nets()
    j_metrics, j_grads = _jax_step(dv, pv, batch, cfg)
    assert float(j_metrics["photo_loss"]) > 1e-3
    assert float(j_metrics["geometry_loss"]) > 1e-5
    gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(j_grads)
    )
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
@pytest.mark.fullopt
def test_production_train_step_fullopt():
    """The SHIPPED train step — make_train_step's fused lax.scan with
    device augmentation, the band64 sampler, Adam and donation — compiled
    under the PRODUCTION XLA pipeline (fullopt marker; the default suite
    compiles with jax_disable_most_optimizations for speed). Guards
    against pipeline-only miscompiles the op-level fullopt goldens can't
    see: runs dispatches and asserts determinism (two runs from the same
    state agree exactly) plus finite loss/params (VERDICT r3 item 8)."""
    from sc_sfmlearner_release_tpu.data.device_augment import (
        AugmentConfig, make_device_augment,
    )
    from sc_sfmlearner_release_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    b, n, h, w, fused = 2, 2, 32, 64, 2
    rng = np.random.RandomState(0)
    k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float32)
    batch = {
        "tgt": rng.randint(0, 256, (fused, b, h, w, 3)).astype(np.uint8),
        "refs": rng.randint(0, 256, (fused, b, n, h, w, 3)).astype(np.uint8),
        "intrinsics": np.broadcast_to(k, (fused, b, 3, 3)).copy(),
    }
    disp_model = DispNet(num_layers=18)
    pose_model = PoseNet(num_layers=18)
    tx = make_optimizer(1e-4)
    cfg = LossConfig(num_scales=1, with_ssim=True, with_mask=True,
                     with_auto_mask=True, sampler="band64")
    step = make_train_step(
        disp_model, pose_model, tx, cfg,
        augment_fn=make_device_augment(AugmentConfig()), fused_steps=fused,
    )

    def run():
        state = create_train_state(
            disp_model, pose_model, tx, jax.random.PRNGKey(0),
            image_shape=(1, h, w, 3),
        )
        state, m1 = step(state, batch)
        state, m2 = step(state, batch)
        return state, np.asarray(m2["loss"], np.float64)

    state_a, loss_a = run()
    state_b, loss_b = run()
    assert np.isfinite(loss_a).all()
    np.testing.assert_array_equal(loss_a, loss_b)
    for leaf in jax.tree_util.tree_leaves(state_a.params):
        assert np.isfinite(np.asarray(leaf)).all()
