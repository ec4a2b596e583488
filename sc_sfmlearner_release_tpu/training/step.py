"""Fused training / evaluation steps.

One jitted XLA program per step: depth for all snippet frames in a single
batched DispNet call, all 2N directed poses in a single batched PoseNet
call, the 3-term loss, the backward pass, and the Adam update. The reference
runs N+1 separate depth forwards and 2N pose forwards per step plus a
Python-level loss loop (/root/reference/train.py:426-444,
loss_functions.py:56-57) — folding everything into the batch axis is the
single biggest TPU win (SURVEY.md §7 "Batch all pairwise work").

Batch layout (see data/loader.py):
  batch = {
    "tgt":        [B, H, W, 3]      target frames
    "refs":       [B, N, H, W, 3]   reference frames
    "intrinsics": [B, 3, 3]
  }
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import compute_depth_errors, photo_and_geometry_loss, smooth_loss
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss configuration (reference flags: train.py:44-59)."""

    photo_weight: float = 1.0
    smooth_weight: float = 0.1
    geometry_weight: float = 0.5
    num_scales: int = 1
    with_ssim: bool = True
    with_mask: bool = True
    with_auto_mask: bool = False
    padding_mode: str = "zeros"
    # Warp sampler (see ops/geometry.py inverse_warp2): "gather" is the
    # torch-exact formulation; "band"/"band<N>" is the banded one-hot MXU
    # formulation (ops/warp_band.py) that avoids TPU HBM gathers (~0.1 G
    # values/s) in the hot path; "mxu" is the round-1 unbanded variant.
    sampler: str = "gather"

    def __post_init__(self):
        from ..ops.geometry import validate_sampler

        validate_sampler(self.sampler)


def _frames_to_batch(tgt: jax.Array, refs: jax.Array) -> jax.Array:
    """[B,H,W,3] + [B,N,H,W,3] -> frame-major [(1+N)*B, H, W, 3]."""
    all_f = jnp.concatenate([tgt[:, None], refs], axis=1)  # [B, 1+N, ...]
    return all_f.swapaxes(0, 1).reshape((-1,) + tgt.shape[1:])


def _split_frames(x: jax.Array, b: int, n: int) -> Tuple[jax.Array, jax.Array]:
    """Inverse of _frames_to_batch for per-frame outputs."""
    tgt = x[:b]
    refs = x[b:].reshape((n, b) + x.shape[1:]).swapaxes(0, 1)
    return tgt, refs


def compute_depth(disp_model, variables, tgt, refs, train: bool):
    """All-frames depth in one batched DispNet call.

    Returns per-scale lists (tgt_depth[s] = [B,h,w,1],
    ref_depths[s] = [B,N,h,w,1]) plus mutated batch_stats when training.
    """
    b, n = tgt.shape[0], refs.shape[1]
    flat = _frames_to_batch(tgt, refs)
    if train:
        disps, mutated = disp_model.apply(
            variables, flat, train=True, mutable=["batch_stats"]
        )
        new_stats = mutated["batch_stats"]
    else:
        disps = disp_model.apply(variables, flat, train=False)
        new_stats = variables.get("batch_stats", {})

    tgt_depth, ref_depths = [], []
    for disp in disps:
        depth = 1.0 / disp
        t, r = _split_frames(depth, b, n)
        tgt_depth.append(t)
        ref_depths.append(r)
    return tgt_depth, ref_depths, new_stats


def compute_pose_with_inv(pose_model, variables, tgt, refs, train: bool):
    """All 2N directed poses in one batched PoseNet call.

    Returns (poses [B,N,6] target->ref, poses_inv [B,N,6] ref->target,
    new batch_stats).
    """
    b, n = tgt.shape[0], refs.shape[1]
    tgt_rep = jnp.broadcast_to(tgt[:, None], refs.shape)
    flat = lambda a: a.swapaxes(0, 1).reshape((-1,) + a.shape[2:])
    img1 = jnp.concatenate([flat(tgt_rep), flat(refs)], axis=0)
    img2 = jnp.concatenate([flat(refs), flat(tgt_rep)], axis=0)

    if train:
        out, mutated = pose_model.apply(
            variables, img1, img2, train=True, mutable=["batch_stats"]
        )
        new_stats = mutated["batch_stats"]
    else:
        out = pose_model.apply(variables, img1, img2, train=False)
        new_stats = variables.get("batch_stats", {})

    poses = out[: n * b].reshape(n, b, 6).swapaxes(0, 1)
    poses_inv = out[n * b :].reshape(n, b, 6).swapaxes(0, 1)
    return poses, poses_inv, new_stats


def _total_loss(
    disp_model,
    pose_model,
    params,
    batch_stats,
    batch: Dict[str, jax.Array],
    cfg: LossConfig,
    train: bool,
    remat: bool = False,
    sample_mask: jax.Array = None,
):
    tgt, refs, intrinsics = batch["tgt"], batch["refs"], batch["intrinsics"]

    def depth_fn(disp_vars, tgt, refs):
        return compute_depth(disp_model, disp_vars, tgt, refs, train)

    def pose_fn(pose_vars, tgt, refs):
        return compute_pose_with_inv(pose_model, pose_vars, tgt, refs, train)

    # Track the band sampler's exact-gather fallback (the 'nf' variants
    # and non-band samplers never fall back): ~free next to the real warp
    # (identical projection subgraph — see ops.geometry.band_fallback_flags).
    track_band = (
        train
        and cfg.sampler.startswith("band")
        and not cfg.sampler.endswith("nf")
    )

    def loss_fn(tgt, refs, intrinsics, tgt_depth, ref_depths, poses, poses_inv):
        out = photo_and_geometry_loss(
            tgt, refs, intrinsics, tgt_depth, ref_depths, poses, poses_inv,
            num_scales=cfg.num_scales,
            with_ssim=cfg.with_ssim,
            with_mask=cfg.with_mask,
            with_auto_mask=cfg.with_auto_mask,
            padding_mode=cfg.padding_mode,
            sampler=cfg.sampler,
            sample_mask=sample_mask,
            return_band_stats=track_band,
        )
        photo, geom = out[0], out[1]
        band_oob = out[2] if track_band else None
        smooth = smooth_loss(tgt_depth, tgt, ref_depths, refs, sample_mask)
        return photo, geom, smooth, band_oob

    if remat:
        # Trade FLOPs for HBM: recompute the networks' activations and the
        # full-resolution warp/SSIM intermediates in the backward pass.
        # Enables ~4x larger per-chip batch at 832x256 (b32 OOMs without it).
        depth_fn = jax.checkpoint(depth_fn)
        pose_fn = jax.checkpoint(pose_fn)
        loss_fn = jax.checkpoint(loss_fn)

    tgt_depth, ref_depths, disp_stats = depth_fn(
        {"params": params["disp"], "batch_stats": batch_stats["disp"]},
        tgt, refs,
    )
    poses, poses_inv, pose_stats = pose_fn(
        {"params": params["pose"], "batch_stats": batch_stats["pose"]},
        tgt, refs,
    )

    photo, geom, smooth, band_oob = loss_fn(
        tgt, refs, intrinsics, tgt_depth, ref_depths, poses, poses_inv
    )

    total = (
        cfg.photo_weight * photo
        + cfg.smooth_weight * smooth
        + cfg.geometry_weight * geom
    )
    metrics = {
        "loss": total,
        "photo_loss": photo,
        "smooth_loss": smooth,
        "geometry_loss": geom,
    }
    if band_oob is not None:
        # 1.0 when this step's scale-0 warp left the PRIMARY band window
        # (ANY directed pair violated it) and so paid a fallback rung —
        # the ladder's wide/cover band, or gather for plain band samplers.
        metrics["band_fallback"] = jnp.any(
            jax.lax.stop_gradient(band_oob)
        ).astype(jnp.float32)
    new_stats = {"disp": disp_stats, "pose": pose_stats}
    return total, (metrics, new_stats)


def make_train_step(
    disp_model, pose_model, tx: optax.GradientTransformation, cfg: LossConfig,
    remat: bool = False,
    augment_fn: Callable = None,
    aug_seed: int = 0,
    fused_steps: int = 1,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """Build the jitted train step. Donates the state for in-place updates.

    ``remat=True`` rematerializes network activations and loss intermediates
    in the backward pass — slower per step but fits ~4x larger batches.

    ``augment_fn`` (data.device_augment): applied to the raw batch inside
    the jitted program, keyed by (aug_seed, state.step) — the resample and
    normalize fuse with the forward pass, and the augmentation stream is
    deterministic for a given seed regardless of device count.

    ``fused_steps=K > 1`` returns a step that takes K host batches stacked
    on a new leading axis (tgt: [K, B, H, W, 3], ...) and runs K optimizer
    steps in ONE dispatch via ``lax.scan``. At the canonical batch-4 config
    the compute is ~0.6 ms/step but each dispatch costs several ms of
    host/runtime latency, so fusing K steps is a ~9x throughput lever at
    small batch (measured on v5e). Metrics come back with a leading [K]
    axis, one entry per optimizer step — the same computation as K unfused
    calls (the augmentation stream is keyed by ``state.step``, which
    advances inside the scan exactly as it would outside). Numerically the
    scanned and unfused programs fuse/reduce in different orders, so
    results agree to fp32 reduction-order noise, not bitwise; Adam
    amplifies that noise on components where ``v ~ 0``.
    """

    def one_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        if augment_fn is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed), state.step)
            batch = augment_fn(key, batch)
        grad_fn = jax.value_and_grad(
            lambda p: _total_loss(
                disp_model, pose_model, p, state.batch_stats, batch, cfg,
                True, remat=remat,
            ),
            has_aux=True,
        )
        (_, (metrics, new_stats)), grads = grad_fn(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if fused_steps <= 1:
        return jax.jit(one_step, donate_argnums=(0,))

    def fused_step(state: TrainState, batches) -> Tuple[TrainState, Dict]:
        return jax.lax.scan(one_step, state, batches)

    return jax.jit(fused_step, donate_argnums=(0,))


def make_eval_step(disp_model, pose_model, cfg: LossConfig):
    """Photometric validation without GT (reference: train.py:302-362):
    same losses in eval mode, auto-mask disabled, and ALWAYS at scale 0
    only — the reference validator builds `tgt_depth = [1/disp_net(tgt)]`
    (train.py:322-326) regardless of the training `--num-scales`.

    If the batch carries ``"n_valid"`` (the loader pads the trailing
    validation batch by repeating the last sample), the padded duplicates
    are masked out of every mean — the metrics equal those of the true
    smaller batch, matching the reference's per-sample averaging."""
    eval_cfg = dataclasses.replace(cfg, with_auto_mask=False, num_scales=1)

    def eval_step(state: TrainState, batch) -> Dict[str, jax.Array]:
        sample_mask = None
        if "n_valid" in batch:
            b = batch["tgt"].shape[0]
            sample_mask = (
                jnp.arange(b) < batch["n_valid"]
            ).astype(batch["tgt"].dtype)
        _, (metrics, _) = _total_loss(
            disp_model, pose_model, state.params, state.batch_stats,
            batch, eval_cfg, False, sample_mask=sample_mask,
        )
        return metrics

    return jax.jit(eval_step)


def make_eval_depth_step(disp_model, dataset: str = "kitti"):
    """GT-depth validation (reference: train.py:365-423): scale-0 disparity
    -> depth -> masked/median-scaled error metrics, entirely on device.
    ``batch["n_valid"]`` (if present) masks the loader's padded duplicate
    samples out of the batch means."""

    @functools.partial(jax.jit, static_argnums=())
    def eval_depth_step(state: TrainState, batch) -> Dict[str, jax.Array]:
        disps = disp_model.apply(
            {
                "params": state.params["disp"],
                "batch_stats": state.batch_stats["disp"],
            },
            batch["img"],
            train=False,
        )
        pred_depth = 1.0 / disps[0][..., 0]
        gt = batch["depth"]
        if gt.shape[1:] != pred_depth.shape[1:]:
            # nearest: parity with the reference's F.interpolate default
            # (train.py:412).
            pred_depth = jax.image.resize(
                pred_depth, (pred_depth.shape[0],) + gt.shape[1:], method="nearest"
            )
        return compute_depth_errors(
            gt, pred_depth, dataset, n_valid=batch.get("n_valid")
        )

    return eval_depth_step


def make_inference_fn(disp_model):
    """Single-image depth inference: returns (disp, depth) at scale 0."""

    @jax.jit
    def infer(variables, img):
        disps = disp_model.apply(variables, img, train=False)
        disp = disps[0]
        return disp, 1.0 / disp

    return infer
