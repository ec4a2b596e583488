#!/usr/bin/env python
"""SC-SfMLearner TPU training CLI.

CLI-parity with the reference trainer (/root/reference/train.py:24-61): same
flags, same on-disk experiment layout (checkpoints/<name>/<timestamp>/), same
CSV/TensorBoard logging channels — but the training loop is a single jitted
XLA program per step, SPMD-sharded over a TPU mesh, with exact
optimizer-inclusive checkpointing and a --resume flag the reference lacks.

Example (reference scripts/train_resnet18_depth_256.sh):
  python train.py $DATA_ROOT --resnet-layers 18 -b4 -s0.1 -c0.5 \
      --epoch-size 1000 --sequence-length 3 --with-auto-mask 1 \
      --with-gt --name resnet18_depth_256
"""

from __future__ import annotations

import argparse
import csv
import datetime
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Structure from Motion Learner training on KITTI and "
        "CityScapes Dataset (TPU-native)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("data", metavar="DIR", help="path to dataset")
    p.add_argument("--folder-type", choices=["sequence", "pair"], default="sequence")
    p.add_argument("--sequence-length", type=int, default=3)
    p.add_argument("-j", "--workers", type=int, default=8)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--epoch-size", type=int, default=0,
                   help="manual epoch size (dataset size if 0)")
    p.add_argument("-b", "--batch-size", type=int, default=4)
    p.add_argument("--lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9, help="adam beta1")
    p.add_argument("--beta", type=float, default=0.999, help="adam beta2")
    p.add_argument("--weight-decay", "--wd", type=float, default=0)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-summary", default="progress_log_summary.csv")
    p.add_argument("--log-full", default="progress_log_full.csv")
    p.add_argument("--log-output", action="store_true")
    p.add_argument("--resnet-layers", type=int, default=18, choices=[18, 50])
    p.add_argument("--num-scales", "--number-of-scales", type=int, default=1)
    p.add_argument("-p", "--photo-loss-weight", type=float, default=1)
    p.add_argument("-s", "--smooth-loss-weight", type=float, default=0.1)
    p.add_argument("-c", "--geometry-consistency-weight", type=float, default=0.5)
    p.add_argument("--with-ssim", type=int, default=1)
    p.add_argument("--with-mask", type=int, default=1)
    p.add_argument("--with-auto-mask", type=int, default=0)
    p.add_argument("--with-pretrain", type=int, default=1,
                   help="ImageNet-pretrained encoder init; weights are "
                   "resolved from --imagenet-weights-dir, then "
                   "$SCDEPTH_IMAGENET_DIR, then the torchvision hub cache "
                   "(~/.cache/torch/hub/checkpoints). Published reference "
                   "accuracy depends on this init — a missing weights "
                   "source is a hard error, never a silent random init")
    p.add_argument("--imagenet-weights-dir", default=None,
                   help="directory holding torchvision ImageNet weights "
                   "(resnet{18,50}.pth or hub-named resnet18-*.pth) for "
                   "encoder init")
    p.add_argument("--dataset", choices=["kitti", "nyu"], default="kitti")
    p.add_argument("--pretrained-disp", default=None,
                   help="path to pretrained DispNet (.msgpack or torch .pth.tar)")
    p.add_argument("--pretrained-pose", default=None,
                   help="path to pretrained PoseNet (.msgpack or torch .pth.tar)")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume full train state from")
    p.add_argument("--name", required=True)
    p.add_argument("--padding-mode", choices=["zeros", "border"], default="zeros")
    p.add_argument("--sampler", default="auto",
                   help="warp sampler. 'band<N>[r<rows>][x<XB>[c<cols>]]"
                   "[l<LB>][nf]' = banded one-hot MXU sampler (scatter/"
                   "gather-free, 2-5x faster full step on v5e; x<XB> adds "
                   "column banding, l<LB> arms the exact fallback ladder "
                   "primary -> LB-row band -> cover band for warps "
                   "outside the displacement budget — see docs/DESIGN.md "
                   "par.3); 'gather' = torch-exact gathers (the parity/"
                   "golden-test reference, but TPU HBM gathers dominate "
                   "its step time); 'mxu' = round-1 unbanded one-hot "
                   "(tested alternative). Default 'auto' = "
                   "band64x368c208l192 on TPU, gather on CPU (the band "
                   "program's scan/remat structure compiles very slowly "
                   "in XLA:CPU, and CPU gathers are fast)")
    p.add_argument("--device-augment", action="store_true",
                   help="run flip/scale-crop/normalize on the TPU inside "
                   "the jitted train step (host only decodes); keeps the "
                   "chip fed when host CPU is the bottleneck")
    p.add_argument("--packed", action="store_true",
                   help="read training frames from DIR/packed (raw uint8 "
                   "memmap built by `python -m sc_sfmlearner_release_tpu."
                   "data.packed DIR`); per-step host work drops to a "
                   "memcpy and H2D carries uint8 — the input path for "
                   "TPU-rate training. With --device-augment the host "
                   "ships raw uint8 and everything else runs on device")
    p.add_argument("--with-gt", action="store_true")
    p.add_argument("--skip-frames", type=int, default=1)
    p.add_argument("--val-batches", type=int, default=0,
                   help="cap validation batches (0 = all)")
    p.add_argument("--no-tensorboard", action="store_true")
    p.add_argument("--log-style", choices=["auto", "bars", "line"],
                   default="auto",
                   help="terminal UI: 'bars' = the reference's fixed-"
                   "position epoch/train/valid bars (logger.py), 'line' = "
                   "plain single-line updates; 'auto' picks bars on a TTY")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace of a few steps "
                   "into this directory (view with TensorBoard)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (functional analogue of the "
                   "reference's anomaly detection, opt-in)")
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16",
                   help="conv compute precision (params, BN stats, heads, "
                   "geometry and losses always fp32); bf16 is ~5x faster "
                   "on TPU")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="shard image width over a second mesh axis (model "
                   "parallelism for per-chip batches < 1); must divide the "
                   "device count (widths that do not divide evenly are "
                   "padded by the GSPMD partitioner)")
    p.add_argument("--fused-steps", type=int, default=1,
                   help="run N optimizer steps per device dispatch "
                   "(lax.scan over N stacked batches); hides host dispatch "
                   "latency — ~9x throughput at the canonical batch 4 on "
                   "v5e. Per-step metrics are still logged individually")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations in the backward pass; "
                   "slower per step but fits ~4x larger per-chip batches")
    p.add_argument("--checkpoint-freq", type=int, default=0,
                   help="also save the full train state every N steps "
                   "(preemption resilience; 0 = per-epoch only)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host (pod) training: calls "
                   "jax.distributed.initialize() (coordinator/process env "
                   "vars per the JAX cluster docs; auto-detected on Cloud "
                   "TPU pods) and feeds each process its disjoint slice of "
                   "every global batch")
    p.add_argument("--full-state-freq", type=int, default=1,
                   help="write the full resume state every N epochs (model "
                   "weights are written every epoch regardless); the full "
                   "state is ~3x the bytes")
    return p


def _stack_fused(batches, k: int):
    """Group k consecutive host batches into one stacked batch [k, B, ...]
    for a fused-steps train step (training.make_train_step(fused_steps=k)).
    A trailing partial group is dropped (training loaders drop_last anyway).
    """
    group = []
    for batch in batches:
        batch.pop("_n_valid", None)
        group.append(batch)
        if len(group) == k:
            stacked = {
                key: np.stack([g[key] for g in group]) for key in group[0]
            }
            yield stacked
            group = []


# Round 3 bisected a TPU-worker kernel fault against staged fused-input
# bytes (368+ MB) and fenced staged batches at 256 MB. Round 4 re-ran the
# fault matrix with the state pinned (tools/staged_chunk_probe.py): the
# staged bytes were a CONFOUND — every "faulting" config runs when the
# warp cannot drift into its fallback branch (lr=0 / nf / ladder), a
# standalone gather step at the same size runs, and the crash reproduces
# exactly when the band sampler's lax.cond executes its GATHER branch at
# batch >= 16 at 832x256 (docs/DESIGN.md §1). The staged-size fence is
# therefore gone (parallel.mesh also stages large stacked arrays as
# bounded <=128 MB transfers); the guard below targets the real trigger.
_COND_GATHER_FAULT_PIXELS = 16 * 832 * 256  # smallest verified-faulting size


def _widened_sampler(sampler: str) -> str:
    """Suggest the same sampler family with a wider primary band (x/c/l
    suffixes preserved — the production 2-D+ladder config must not be
    collapsed to a bare 1-D band by a widening hint)."""
    from sc_sfmlearner_release_tpu.ops.geometry import _parse_band

    if not sampler.startswith("band"):
        return "band96r8"
    band, rows, xband, cols, fb, ladder = _parse_band(sampler)
    new_band = band + band // 2 + (-(band + band // 2)) % rows
    s = f"band{new_band}"
    if rows != 8:
        s += f"r{rows}"
    if xband is not None:
        s += f"x{xband}"
        if cols is not None:
            s += f"c{cols}"
    if ladder is not None:
        s += f"l{max(ladder, 2 * new_band)}"
    if not fb:
        s += "nf"
    return s


def _check_cond_gather_fault(sampler: str, batch_size: int, h: int, w: int
                             ) -> None:
    """Refuse the verified TPU-worker-crash construct: a band sampler
    whose ONLY fallback is the gather branch, at the batch/resolution
    where executing that branch kernel-faults the worker. The l<LB>
    ladder replaces the gather rung with the always-fits cover band and
    is crash-free at the same size (probe-verified)."""
    from sc_sfmlearner_release_tpu.ops.geometry import (
        _parse_band, validate_sampler,
    )

    if not sampler.startswith("band"):
        return
    validate_sampler(sampler)  # rejects un-armed ladders (l<LB> <= band)
    band, rows, xband, cols, fb, ladder = _parse_band(sampler)
    if not fb or (ladder is not None and ladder > band):
        return
    if batch_size * h * w >= _COND_GATHER_FAULT_PIXELS:
        raise SystemExit(
            f"sampler {sampler!r} at batch {batch_size} ({w}x{h}): the "
            "band sampler's exact-gather fallback branch kernel-faults "
            "the TPU worker at this size when a warp leaves the band "
            "(docs/DESIGN.md §1 fault matrix). Use the fallback ladder "
            f"instead — e.g. --sampler {sampler}l{max(2 * band, 128)} — "
            "or lower --batch-size."
        )


def _find_imagenet_weights(explicit_dir, num_layers: int):
    """Locate a torchvision ImageNet .pth for resnet{num_layers}.

    Search order: --imagenet-weights-dir, $SCDEPTH_IMAGENET_DIR, the
    torchvision hub cache (~/.cache/torch/hub/checkpoints, where
    `torchvision.models.resnet18(weights=...)` stages its download —
    the reference's auto-download path, resnet_encoder.py:52-56).
    Accepts both plain `resnet18.pth` and hub-named `resnet18-f37072fd.pth`.
    Returns the path or None.
    """
    import glob

    candidates = [
        explicit_dir,
        os.environ.get("SCDEPTH_IMAGENET_DIR"),
        os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    ]
    for d in candidates:
        if not d or not os.path.isdir(d):
            continue
        exact = os.path.join(d, f"resnet{num_layers}.pth")
        if os.path.isfile(exact):
            return exact
        hits = sorted(glob.glob(os.path.join(d, f"resnet{num_layers}-*.pth")))
        if hits:
            return hits[0]
    return None


def _load_net_variables(path: str, kind: str, num_layers: int):
    """Load .msgpack (ours) or .pth.tar (reference torch) net weights."""
    from sc_sfmlearner_release_tpu.models import convert as C

    if path.endswith((".pth", ".pth.tar", ".pt")):
        sd = C.load_torch_state_dict(path)
        if kind == "disp":
            return C.convert_disp_checkpoint(sd, num_layers)
        return C.convert_pose_checkpoint(sd, 18)
    import flax.serialization

    with open(path, "rb") as f:
        blob = f.read()
    return flax.serialization.msgpack_restore(blob)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.distributed:
        # Multi-host SPMD: every process runs this same program; the global
        # device mesh spans the pod and each process feeds its local slice
        # of the batch (SURVEY.md §5.8). Must run before any backend use.
        jax.distributed.initialize()
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()
    if proc_cnt > 1:
        print(f"=> multi-host: process {proc_idx}/{proc_cnt}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    if args.debug_nans:
        from sc_sfmlearner_release_tpu.utils import enable_nan_debugging

        enable_nan_debugging()

    from sc_sfmlearner_release_tpu.data import (
        BatchLoader, PairSet, SequenceSet, ValidationSet, transforms,
    )
    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.models import convert as C
    from sc_sfmlearner_release_tpu.parallel import (
        device_prefetch, make_mesh, replicate, shard_batch,
    )
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_eval_depth_step, make_eval_step,
        make_optimizer, make_train_step, restore_train_state, save_checkpoint,
    )
    from sc_sfmlearner_release_tpu.utils import AverageMeter, make_logger

    is_main = proc_idx == 0  # only process 0 writes checkpoints/logs
    timestamp = datetime.datetime.now().strftime("%m-%d-%H:%M")
    save_path = os.path.join("checkpoints", args.name, timestamp)
    os.makedirs(save_path, exist_ok=True)
    print(f"=> will save everything to {save_path}")

    tb_writer = None
    output_writers = []
    if not args.no_tensorboard and is_main:
        try:
            from tensorboardX import SummaryWriter

            tb_writer = SummaryWriter(save_path)
            if args.log_output:
                output_writers = [
                    SummaryWriter(os.path.join(save_path, "valid", str(i)))
                    for i in range(3)
                ]
        except ImportError:
            pass

    # ---- data ------------------------------------------------------------
    if args.device_augment:
        train_tf = transforms.raw_train_transform()
    else:
        train_tf = transforms.train_transform()
    valid_tf = transforms.valid_transform()

    if args.packed:
        if args.folder_type != "sequence":
            raise SystemExit("--packed supports --folder-type sequence")
        from sc_sfmlearner_release_tpu.data import PackedSequenceSet

        packed_dir = os.path.join(args.data, "packed")
        if not os.path.isdir(packed_dir):
            raise SystemExit(
                f"--packed: {packed_dir} not found; build it once with "
                f"`python -m sc_sfmlearner_release_tpu.data.packed {args.data}`"
            )
        # Under --device-augment the packed loader ships raw uint8 (4x
        # fewer H2D bytes); otherwise the host transforms run on the
        # decoded frames exactly as with SequenceSet.
        train_set = PackedSequenceSet(
            packed_dir, train=True, sequence_length=args.sequence_length,
            skip_frames=args.skip_frames,
            transform=None if args.device_augment else train_tf,
        )
    elif args.folder_type == "sequence":
        train_set = SequenceSet(
            args.data, train=True, sequence_length=args.sequence_length,
            skip_frames=args.skip_frames, transform=train_tf,
            dataset=args.dataset,
        )
    else:
        train_set = PairSet(args.data, train=True, transform=train_tf)

    if args.with_gt:
        val_set = ValidationSet(args.data, transform=valid_tf, dataset=args.dataset)
    else:
        if args.folder_type == "sequence":
            val_set = SequenceSet(
                args.data, train=False, sequence_length=args.sequence_length,
                skip_frames=args.skip_frames, transform=valid_tf,
                dataset=args.dataset,
            )
        else:
            val_set = PairSet(args.data, train=False, transform=valid_tf)

    print(f"{len(train_set)} samples found in {len(train_set.scenes)} train scenes")
    print(f"{len(val_set)} samples found in {len(val_set.scenes)} valid scenes")

    train_loader = BatchLoader(
        train_set, args.batch_size, shuffle=True,
        num_workers=args.workers, drop_last=True, seed=args.seed,
        process_index=proc_idx, process_count=proc_cnt,
    )
    val_loader = BatchLoader(
        val_set, args.batch_size, shuffle=False,
        num_workers=args.workers, drop_last=False, seed=args.seed,
        process_index=proc_idx, process_count=proc_cnt,
    )
    epoch_size = args.epoch_size or len(train_loader)

    # ---- models / state ----------------------------------------------------
    # the data mesh must evenly divide the global batch; use the largest
    # divisor of batch_size that fits the available devices (per spatial group
    # when --spatial-shards > 1)
    n_dev = len(jax.devices())
    sp = args.spatial_shards
    if sp > 1:
        if n_dev % sp != 0:
            raise SystemExit(f"--spatial-shards {sp} must divide the "
                             f"device count {n_dev}")
        n_groups = n_dev // sp
        n_data = max(d for d in range(1, n_groups + 1)
                     if args.batch_size % d == 0)
        from sc_sfmlearner_release_tpu.parallel import make_mesh_2d

        mesh = make_mesh_2d(sp, jax.devices()[: n_data * sp])
    else:
        n_use = max(d for d in range(1, n_dev + 1) if args.batch_size % d == 0)
        if n_use != n_dev:
            print(f"=> using {n_use}/{n_dev} devices (batch "
                  f"{args.batch_size} must divide evenly)")
        mesh = make_mesh(jax.devices()[:n_use])
    print(f"=> mesh: {mesh}")

    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    disp_model = DispNet(num_layers=args.resnet_layers, dtype=compute_dtype)
    pose_model = PoseNet(num_layers=18, dtype=compute_dtype)

    disp_vars = pose_vars = None
    if args.with_pretrain:
        disp_pth = _find_imagenet_weights(args.imagenet_weights_dir,
                                          args.resnet_layers)
        pose_pth = _find_imagenet_weights(args.imagenet_weights_dir, 18)
        if disp_pth is None or pose_pth is None:
            if args.pretrained_disp and args.pretrained_pose:
                # Full warm-start checkpoints supersede the ImageNet init.
                print("=> --with-pretrain: no ImageNet weights found, but "
                      "both nets are warm-started from checkpoints")
            else:
                missing = (f"resnet{args.resnet_layers}"
                           if disp_pth is None else "resnet18")
                raise SystemExit(
                    f"--with-pretrain 1 but no ImageNet weights for "
                    f"{missing} were found. Published reference accuracy "
                    f"(Abs Rel 0.119/0.114) depends on this init — refusing "
                    f"to silently train from random weights.\n"
                    f"Stage torchvision .pth files (resnet18.pth / "
                    f"resnet50.pth, or hub-named resnet18-*.pth) in one of:\n"
                    f"  --imagenet-weights-dir DIR\n"
                    f"  $SCDEPTH_IMAGENET_DIR\n"
                    f"  ~/.cache/torch/hub/checkpoints  (torchvision's "
                    f"download cache)\n"
                    f"e.g. on a machine with internet:  python -c "
                    f"\"import torchvision.models as m; "
                    f"m.resnet18(weights='IMAGENET1K_V1')\"  then copy the "
                    f"cache dir.  Or pass --with-pretrain 0 to train from "
                    f"scratch deliberately."
                )
        else:
            # ImageNet encoder init with random decoders.
            print(f"=> ImageNet encoder init: disp={disp_pth} pose={pose_pth}")
            rng = jax.random.PRNGKey(args.seed)
            dummy = np.zeros((1, 64, 64, 3), np.float32)
            disp_init = jax.jit(lambda k, x: disp_model.init(k, x, train=True))(
                rng, dummy
            )
            pose_init = jax.jit(lambda k, x: pose_model.init(k, x, x, train=True))(
                rng, dummy
            )
            disp_sd = C.load_torch_state_dict(disp_pth)
            pose_sd = C.load_torch_state_dict(pose_pth)
            disp_vars = C.graft_imagenet_encoder(
                disp_init, disp_sd, args.resnet_layers, 1
            )
            pose_vars = C.graft_imagenet_encoder(pose_init, pose_sd, 18, 2)

    if args.pretrained_disp:
        print("=> using pre-trained weights for DispNet")
        disp_vars = _load_net_variables(args.pretrained_disp, "disp", args.resnet_layers)
    if args.pretrained_pose:
        print("=> using pre-trained weights for PoseNet")
        pose_vars = _load_net_variables(args.pretrained_pose, "pose", 18)

    tx = make_optimizer(args.lr, args.momentum, args.beta, args.weight_decay)
    state = create_train_state(
        disp_model, pose_model, tx, jax.random.PRNGKey(args.seed),
        disp_variables=disp_vars, pose_variables=pose_vars,
    )
    if args.resume:
        print(f"=> resuming full train state from {args.resume}")
        state = restore_train_state(args.resume, state)
    state = replicate(state, mesh)

    sampler = args.sampler
    if sampler == "auto":
        # band80r16x368c208l192: 2-D banded primary under the round-5
        # canonical-taps formulation (81.1 ms/step with the ladder armed
        # on v5e vs 90.2 for round-4's band64x368c208l192) with a BIGGER
        # displacement budget than the old default (32 rows / 80 px vs
        # 28/80): it is faster on the primary path AND halves the
        # measured city-speed fallback rate (1.8% vs 3.2% per directed
        # pair), so it dominates the old default in every measured motion
        # regime; the fallback ladder caps budget violations at the
        # 192-row rung (docs/DESIGN.md par.3).
        sampler = ("gather" if jax.default_backend() == "cpu"
                   else "band80r16x368c208l192")
        print(f"=> sampler: {sampler} (auto)")

    if len(train_set):
        sample0 = train_set.load(0, np.random.default_rng(0))
        _check_cond_gather_fault(
            sampler, args.batch_size,
            sample0["tgt"].shape[0], sample0["tgt"].shape[1],
        )

    cfg = LossConfig(
        photo_weight=args.photo_loss_weight,
        smooth_weight=args.smooth_loss_weight,
        geometry_weight=args.geometry_consistency_weight,
        num_scales=args.num_scales,
        with_ssim=bool(args.with_ssim),
        with_mask=bool(args.with_mask),
        with_auto_mask=bool(args.with_auto_mask),
        padding_mode=args.padding_mode,
        sampler=sampler,
    )
    augment_fn = None
    if args.device_augment:
        from sc_sfmlearner_release_tpu.data.device_augment import (
            AugmentConfig, make_device_augment,
        )

        augment_fn = make_device_augment(AugmentConfig())
    fused = max(args.fused_steps, 1)
    if fused > 1 and fused > epoch_size:
        # _stack_fused drops trailing partial groups; a fused size larger
        # than the epoch would silently train zero steps per epoch.
        print(f"=> clamping --fused-steps {fused} to epoch size {epoch_size}")
        fused = max(1, epoch_size)
    train_step = make_train_step(disp_model, pose_model, tx, cfg,
                                 remat=args.remat, augment_fn=augment_fn,
                                 aug_seed=args.seed, fused_steps=fused)
    eval_step = make_eval_step(disp_model, pose_model, cfg)
    eval_depth_step = make_eval_depth_step(disp_model, args.dataset)

    @jax.jit
    def _infer_disp(state, img):
        return disp_model.apply(
            {"params": state.params["disp"],
             "batch_stats": state.batch_stats["disp"]},
            img, train=False,
        )[0][..., 0]

    # ---- logging ----------------------------------------------------------
    if is_main:
        with open(os.path.join(save_path, args.log_summary), "w", newline="") as f:
            csv.writer(f, delimiter="\t").writerow(["train_loss", "validation_loss"])
        with open(os.path.join(save_path, args.log_full), "w", newline="") as f:
            csv.writer(f, delimiter="\t").writerow(
                ["train_loss", "photo_loss", "smooth_loss", "geometry_consistency_loss"]
            )

    logger = make_logger(args.epochs, epoch_size, len(val_loader),
                         style=args.log_style, is_main=is_main)
    best_error = -1.0
    n_iter = 0
    profile_done = False

    for epoch in range(args.epochs):
        logger.start_epoch(epoch)
        train_loader.set_epoch(epoch)

        # ---- train ----------------------------------------------------
        profiling = False
        losses = AverageMeter(precision=4)
        # device-side metric futures, synced once at epoch end (per-step
        # .item() syncs are a reference-side slowdown we avoid)
        pending = []
        t_data, t_step = AverageMeter(), AverageMeter()
        end = time.time()
        epoch_steps = 0
        train_iter = (
            train_loader if fused == 1 else _stack_fused(iter(train_loader), fused)
        )
        for batch, _ in device_prefetch(train_iter, mesh, stacked=fused > 1):
            if epoch_steps >= epoch_size:
                break
            t_data.update(time.time() - end)

            # profile exactly one dispatch, skipping the first (which
            # includes the compile) — works for any --fused-steps size
            if (args.profile_dir and not profile_done and not profiling
                    and n_iter >= fused):
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            state, metrics = train_step(state, batch)
            prev_iter, n_iter = n_iter, n_iter + fused
            epoch_steps += fused
            if profiling:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                profile_done = True

            pending.append(metrics)
            if args.checkpoint_freq and (
                n_iter // args.checkpoint_freq > prev_iter // args.checkpoint_freq
            ) and is_main:
                save_checkpoint(save_path, state, is_best=False, epoch=epoch)
            # did [prev_iter, n_iter) contain a multiple of print_freq?
            if (n_iter - 1) // args.print_freq > (prev_iter - 1) // args.print_freq:
                m = {
                    k: float(np.asarray(v).reshape(-1)[-1])
                    for k, v in metrics.items()
                }
                losses.update(m["loss"], args.batch_size)
                if tb_writer is not None:
                    tb_writer.add_scalar("photometric_error", m["photo_loss"], n_iter)
                    tb_writer.add_scalar("disparity_smoothness_loss", m["smooth_loss"], n_iter)
                    tb_writer.add_scalar("geometry_consistency_loss", m["geometry_loss"], n_iter)
                    tb_writer.add_scalar("total_loss", m["loss"], n_iter)
                    if "band_fallback" in m:
                        tb_writer.add_scalar(
                            "band_fallback", m["band_fallback"], n_iter
                        )
                logger.train_update(
                    min(epoch_steps, epoch_size),
                    f"Time {t_step} Data {t_data} Loss {losses}",
                )
            t_step.update(time.time() - end)
            end = time.time()
        if profiling:  # epoch ended inside the trace window
            jax.profiler.stop_trace()
            profiling = False
        logger.train_update(min(epoch_steps, epoch_size), "")

        # one sync for the whole epoch's metrics; fused metrics carry a
        # leading [K] axis — one CSV row per optimizer step either way
        full_rows = []
        for m in pending:
            full_rows.extend(
                np.stack(
                    [np.asarray(m["loss"], np.float64).reshape(-1),
                     np.asarray(m["photo_loss"], np.float64).reshape(-1),
                     np.asarray(m["smooth_loss"], np.float64).reshape(-1),
                     np.asarray(m["geometry_loss"], np.float64).reshape(-1)],
                    axis=-1,
                ).tolist()
            )
        train_loss = (
            float(np.mean([r[0] for r in full_rows])) if full_rows else 0.0
        )
        logger.write(f" * Avg Loss : {train_loss:.3f}")
        # Band-sampler fallback rate: each flagged step left the PRIMARY
        # band window and paid a fallback rung (the l<LB> ladder's wide /
        # cover band, ~1.2-2x a primary step; or the exact gather path,
        # ~4.5x, for plain band samplers) — surface it so a throughput
        # regression on real data is attributable.
        fb = [
            float(np.mean(np.asarray(m["band_fallback"], np.float64)))
            for m in pending if "band_fallback" in m
        ]
        if fb and float(np.mean(fb)) > 0:
            logger.write(
                f" * Band-sampler fallback rate: {float(np.mean(fb)):.1%} "
                "of steps left the primary band window and paid a "
                "fallback rung (if this costs throughput, widen the "
                f"primary — e.g. --sampler {_widened_sampler(sampler)})"
            )

        if is_main:
            with open(os.path.join(save_path, args.log_full), "a", newline="") as f:
                csv.writer(f, delimiter="\t").writerows(full_rows)

        # ---- validate -------------------------------------------------
        if args.with_gt:
            errors, error_names = _validate_with_gt(
                args, val_loader, state, eval_depth_step, mesh, shard_batch,
                logger, output_writers, _infer_disp, epoch,
            )
        else:
            errors, error_names = _validate_without_gt(
                args, val_loader, state, eval_step, mesh, shard_batch, logger,
                output_writers, _infer_disp, epoch,
            )
        err_str = ", ".join(
            f"{n} : {e:.3f}" for n, e in zip(error_names, errors)
        )
        logger.write(f" * Avg {err_str}")
        if tb_writer is not None:
            for err, name in zip(errors, error_names):
                tb_writer.add_scalar(name, err, epoch)

        decisive_error = errors[1]
        if best_error < 0:
            best_error = decisive_error
        is_best = decisive_error <= best_error
        best_error = min(best_error, decisive_error)
        if is_main:
            save_checkpoint(
                save_path, state, is_best, epoch=epoch + 1,
                full_state=(epoch + 1) % max(args.full_state_freq, 1) == 0
                or epoch + 1 == args.epochs,
            )
            with open(os.path.join(save_path, args.log_summary), "a", newline="") as f:
                csv.writer(f, delimiter="\t").writerow([train_loss, decisive_error])

    logger.finish()
    return 0


def _log_val_images(writers, infer_disp, state, img_batch, i, epoch):
    """TB depth/disparity images for the first len(writers) val batches
    (reference behavior: train.py:328-337, 390-408)."""
    if i >= len(writers):
        return
    from sc_sfmlearner_release_tpu.utils import tensor2array

    disp = np.asarray(infer_disp(state, img_batch))[0]
    img = np.asarray(img_batch[0])
    w = writers[i]
    if epoch == 0:
        w.add_image("val Input", tensor2array(img), 0, dataformats="HWC")
    w.add_image(
        "val Dispnet Output Normalized",
        tensor2array(disp, max_value=None, colormap="magma"),
        epoch, dataformats="HWC",
    )
    w.add_image(
        "val Depth Output",
        tensor2array(1.0 / disp, max_value=10),
        epoch, dataformats="HWC",
    )


def _validate_with_gt(args, val_loader, state, eval_depth_step, mesh, shard,
                      logger, output_writers=(), infer_disp=None, epoch=0):
    names = ["abs_diff", "abs_rel", "sq_rel", "a1", "a2", "a3"]
    from sc_sfmlearner_release_tpu.utils import AverageMeter

    meter = AverageMeter(i=len(names))
    for i, batch in enumerate(val_loader):
        if args.val_batches and i >= args.val_batches:
            break
        n_valid = int(batch.pop("_n_valid"))
        batch["n_valid"] = np.asarray(n_valid, np.int32)
        sharded = shard(batch, mesh)
        metrics = eval_depth_step(state, sharded)
        if output_writers and infer_disp is not None:
            _log_val_images(output_writers, infer_disp, state,
                            sharded["img"], i, epoch)
        meter.update([float(metrics[n]) for n in names], n=n_valid)
        if i % args.print_freq == 0:
            logger.valid_update(i + 1, f"Abs Error {meter.avg[0]:.4f}")
    return meter.avg, names


def _validate_without_gt(args, val_loader, state, eval_step, mesh, shard,
                         logger, output_writers=(), infer_disp=None, epoch=0):
    names = ["Total loss", "Photo loss", "Smooth loss", "Consistency loss"]
    from sc_sfmlearner_release_tpu.utils import AverageMeter

    meter = AverageMeter(i=4, precision=4)
    for i, batch in enumerate(val_loader):
        if args.val_batches and i >= args.val_batches:
            break
        n_valid = int(batch.pop("_n_valid"))
        batch["n_valid"] = np.asarray(n_valid, np.int32)
        batch = shard(batch, mesh)
        m = eval_step(state, batch)
        if output_writers and infer_disp is not None:
            _log_val_images(output_writers, infer_disp, state,
                            batch["tgt"], i, epoch)
        photo = float(m["photo_loss"])
        meter.update(
            [photo, photo, float(m["smooth_loss"]), float(m["geometry_loss"])],
            n=n_valid,
        )
        if i % args.print_freq == 0:
            logger.valid_update(i + 1, f"Loss {meter}")
    return meter.avg, names


if __name__ == "__main__":
    sys.exit(main())
