#!/usr/bin/env python
"""Wall-clock ablation of the production fused train step.

Per-op traces on the tunneled TPU are unusable for attribution (the
profiler's per-event overhead inflates device time ~5x — ~6400 op events
per step), so this tool attributes cost by MEASURING variants of the step
with one component changed at a time, using the same chained-dispatch
slope protocol as bench.py (warm, then slope between a 2-dispatch and an
n-dispatch chain).

Usage: python tools/ablate_step.py [--configs full,no_ssim,...] [--n 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np

B, N, H, W = 4, 2, 256, 832
FUSED = 16


def build(variant: dict):
    global B, FUSED
    B = variant.get("batch", 4)
    FUSED = variant.get("fused", 16)
    import jax
    import jax.numpy as jnp

    from sc_sfmlearner_release_tpu.data.device_augment import (
        AugmentConfig, make_device_augment,
    )
    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.parallel import (
        make_mesh, replicate, shard_batch,
    )
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    mesh = make_mesh()
    k = np.array(
        [[241.67, 0, W / 2], [0, 246.28, H / 2], [0, 0, 1]], np.float32
    )
    r = np.random.RandomState(0)
    augment = variant.get("augment", True)
    host = {
        "tgt": r.randint(0, 256, (FUSED, B, H, W, 3), np.uint8),
        "refs": r.randint(0, 256, (FUSED, B, N, H, W, 3), np.uint8),
        "intrinsics": np.broadcast_to(k, (FUSED, B, 3, 3)).copy(),
    }
    if not augment:
        host["tgt"] = host["tgt"].astype(np.float32) / 255.0
        host["refs"] = host["refs"].astype(np.float32) / 255.0

    layers = variant.get("layers", 18)
    stem = {"packed_stem": True, "stem_pack": variant["stem_pack"]} \
        if "stem_pack" in variant else {}
    disp = DispNet(num_layers=layers, dtype=jnp.bfloat16,
                   packed_decoder=variant.get("packed_decoder", True),
                   decoder_pack_caps=variant.get("dec_pack_caps"),
                   **stem)
    pose = PoseNet(num_layers=18, dtype=jnp.bfloat16, **stem)
    # lr=0 keeps the state fixed across the timing chains (same Adam
    # FLOPs): the random-data drift otherwise grows pose/depth until the
    # warp leaves a band sampler's budget mid-measurement, silently timing
    # the FALLBACK branch instead of the sampler under test.
    tx = make_optimizer(variant.get("lr", 1e-4))
    state = create_train_state(disp, pose, tx, jax.random.PRNGKey(0))
    state = replicate(state, mesh)

    if variant.get("enc_only"):
        # ResNet encoder alone (fwd / fwd+bwd+opt on the DispNet-shaped
        # batch): splits the disp cost into encoder vs decoder per depth.
        import optax

        from sc_sfmlearner_release_tpu.models.resnet import ResNetEncoder

        enc = ResNetEncoder(
            num_layers=layers, dtype=jnp.bfloat16,
            packed=variant.get("packed", True),
        )
        imgs = np.concatenate(
            [host["tgt"][:, :, None], host["refs"]], axis=2
        ).reshape(FUSED, B * (N + 1), H, W, 3)
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        host = {"imgs": imgs}
        evars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                         train=True)
        etx = optax.adam(1e-4)
        eopt = etx.init(evars["params"])
        state = replicate(
            {"params": evars["params"], "stats": evars["batch_stats"],
             "opt": eopt, "step": jnp.zeros((), jnp.int32)}, mesh)
        fwd_only = variant.get("fwd_only", False)

        def one(state, batch):
            def loss_fn(params):
                feats, upd = enc.apply(
                    {"params": params, "batch_stats": state["stats"]},
                    batch["imgs"], train=True, mutable=["batch_stats"],
                )
                s = sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
                return s * 1e-6, upd["batch_stats"]

            if fwd_only:
                loss, stats = loss_fn(state["params"])
                return {**state, "stats": stats,
                        "step": state["step"] + 1}, {"loss": loss[None]}
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            updates, opt = etx.update(grads, state["opt"], state["params"])
            return {
                "params": optax.apply_updates(state["params"], updates),
                "stats": stats, "opt": opt, "step": state["step"] + 1,
            }, {"loss": loss[None]}

        step = jax.jit(
            lambda s, b: jax.lax.scan(one, s, b), donate_argnums=(0,)
        )
        batch = shard_batch(host, mesh, stacked=True)
        pick = jax.jit(
            lambda m: m["loss"].ravel()[-1].astype(jnp.float32))
        return step, state, batch, pick

    if variant.get("convs_only"):
        # Networks fwd+bwd+optimizer only: dummy sum loss in place of the
        # warp/photometric chain — isolates the conv-stack cost. Variant
        # knobs: nets = both|disp|pose, train_bn (False = frozen BN stats,
        # isolating the batch-statistics passes), opt = adam|sgd.
        import optax

        from sc_sfmlearner_release_tpu.training.step import (
            compute_depth, compute_pose_with_inv,
        )

        aug = make_device_augment(AugmentConfig()) if augment else None
        nets = variant.get("nets", "both")
        train_bn = variant.get("train_bn", True)
        if variant.get("opt") == "sgd":
            tx = optax.sgd(1e-4)
            state = create_train_state(disp, pose, tx, jax.random.PRNGKey(0))
            state = replicate(state, mesh)

        fwd_only = variant.get("fwd_only", False)

        def one(state, batch):
            if aug is not None:
                key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
                batch = aug(key, batch)

            def loss_fn(params):
                s = jnp.zeros((), jnp.float32)
                ds, ps = state.batch_stats["disp"], state.batch_stats["pose"]
                if nets in ("both", "disp"):
                    td, rd, ds2 = compute_depth(
                        disp,
                        {"params": params["disp"], "batch_stats": ds},
                        batch["tgt"], batch["refs"], train_bn,
                    )
                    ds = ds2 if train_bn else ds
                    s += sum(jnp.sum(t.astype(jnp.float32)) for t in td)
                if nets in ("both", "pose"):
                    p, pi, ps2 = compute_pose_with_inv(
                        pose,
                        {"params": params["pose"], "batch_stats": ps},
                        batch["tgt"], batch["refs"], train_bn,
                    )
                    ps = ps2 if train_bn else ps
                    s += jnp.sum(p) + jnp.sum(pi)
                return s * 1e-6, {"disp": ds, "pose": ps}

            if fwd_only:
                # forward pass only (no grad/opt): the fwd-vs-(fwd+bwd)
                # delta sizes the backward structure per net
                loss, stats = loss_fn(state.params)
                return state.replace(
                    step=state.step + 1, batch_stats=stats
                ), {"loss": loss[None]}
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params)
            return state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=stats, opt_state=opt_state,
            ), {"loss": loss[None]}

        def fused(state, batches):
            return jax.lax.scan(one, state, batches)

        step = jax.jit(fused, donate_argnums=(0,))
    else:
        # Optional smooth-loss excision (it is computed unconditionally in
        # the production step, so weight=0 would not remove its cost):
        # patch the step module's imported symbol, restoring the original
        # for subsequent configs in this process.
        import sc_sfmlearner_release_tpu.training.step as _step
        global _ORIG_SMOOTH
        if "_ORIG_SMOOTH" not in globals():
            _ORIG_SMOOTH = _step.smooth_loss
        _step.smooth_loss = (
            (lambda *a, **k: jnp.zeros(())) if variant.get("no_smooth")
            else _ORIG_SMOOTH
        )
        cfg = LossConfig(
            num_scales=1,
            with_ssim=variant.get("ssim", True),
            with_mask=variant.get("mask", True),
            with_auto_mask=variant.get("auto_mask", True),
            sampler=variant.get("sampler", "band64"),
        )
        step = make_train_step(
            disp, pose, tx, cfg,
            augment_fn=make_device_augment(AugmentConfig())
            if augment else None,
            fused_steps=FUSED,
            remat=variant.get("remat", False),
        )
    batch = shard_batch(host, mesh, stacked=True)
    pick = jax.jit(lambda m: m["loss"].ravel()[-1].astype(jnp.float32))
    return step, state, batch, pick


CONFIGS = {
    "full": {},
    "no_ssim": {"ssim": False},
    "no_masks": {"mask": False, "auto_mask": False},
    "plain_l1": {"ssim": False, "mask": False, "auto_mask": False},
    "no_augment": {"augment": False},
    "band32": {"sampler": "band32"},
    "band48": {"sampler": "band48"},
    "band96": {"sampler": "band96"},
    "convs_only": {"convs_only": True},
    "convs_only_noaug": {"convs_only": True, "augment": False},
    "disp_only": {"convs_only": True, "nets": "disp"},
    "pose_only": {"convs_only": True, "nets": "pose"},
    "convs_frozen_bn": {"convs_only": True, "train_bn": False},
    "convs_sgd": {"convs_only": True, "opt": "sgd"},
    "band64r16": {"sampler": "band64r16"},
    "band64r32": {"sampler": "band64r32"},
    "band48r16": {"sampler": "band48r16"},
    "band80r16": {"sampler": "band80r16"},
    "remat": {"remat": True},
    "unpacked_decoder": {"packed_decoder": False},
    "disp_only_unpacked": {"convs_only": True, "nets": "disp",
                           "packed_decoder": False},
    "remat_b16": {"remat": True, "batch": 16},
    "remat_b16_f8": {"remat": True, "batch": 16, "fused": 8},
    "b16": {"batch": 16},
    "b16_f8_noaug": {"batch": 16, "fused": 8, "augment": False},
    "b16_f8_noaug_unpacked": {"batch": 16, "fused": 8, "augment": False,
                              "packed_decoder": False},
    "b16_f8": {"batch": 16, "fused": 8},
    "b8": {"batch": 8},
    "b16_f12": {"batch": 16, "fused": 12},
    "r50": {"layers": 50},
    "r50_prod_lr0": {"layers": 50, "sampler": "band64x368c208l192",
                     "lr": 0.0},
    "band64nf": {"sampler": "band64nf"},
    # 2-D banding: x<window>c<tile-cols>; margins 104/64/64 px.
    "band64x416c208": {"sampler": "band64x416c208"},
    "band64x336c208": {"sampler": "band64x336c208"},
    "band64x232c104": {"sampler": "band64x232c104"},
    "band64x336c208nf": {"sampler": "band64x336c208nf"},
    "band64x416c208nf": {"sampler": "band64x416c208nf"},
    # ncol=2 variants: halve the tile count the 4/8-column tilings pay for
    "band64x624c416": {"sampler": "band64x624c416"},
    "band64x512c416": {"sampler": "band64x512c416"},
    # lr=0 variants: state cannot drift out of the band budget, so these
    # time the guarded sampler's FAST path (fallback present, not taken)
    "full_lr0": {"lr": 0.0},
    "band64x416c208_lr0": {"sampler": "band64x416c208", "lr": 0.0},
    "band64x416c208l128_lr0": {"sampler": "band64x416c208l128", "lr": 0.0},
    "band48x416c208_lr0": {"sampler": "band48x416c208", "lr": 0.0},
    "band64l128_lr0": {"sampler": "band64l128", "lr": 0.0},
    "band96x416c208_lr0": {"sampler": "band96x416c208", "lr": 0.0},
    "band96x416c208l192_lr0": {"sampler": "band96x416c208l192", "lr": 0.0},
    "band192_lr0": {"sampler": "band192", "lr": 0.0},
    "band64x368c208_lr0": {"sampler": "band64x368c208", "lr": 0.0},
    "band64x312c208_lr0": {"sampler": "band64x312c208", "lr": 0.0},
    "band64x368c208l192_lr0": {"sampler": "band64x368c208l192", "lr": 0.0},
    # same 80-px x budget / 28-row y budget as x368c208 (identical
    # fallback rates by construction), smaller contraction K=265, 2x tiles
    "band64x264c104l192_lr0": {"sampler": "band64x264c104l192", "lr": 0.0},
    "band64x288c128l192_lr0": {"sampler": "band64x288c128l192", "lr": 0.0},
    # round-5 handoff: size the non-warp tail at the production sampler
    "prod_plain_l1_lr0": {"sampler": "band64x368c208l192", "lr": 0.0,
                          "ssim": False, "mask": False, "auto_mask": False},
    "prod_noaug_lr0": {"sampler": "band64x368c208l192", "lr": 0.0,
                       "augment": False},
    "convs_only_lr0": {"convs_only": True, "lr": 0.0},
    "band64x312c208l192_lr0": {"sampler": "band64x312c208l192", "lr": 0.0},
    # space-to-depth stem (pack=1: pure s2d, no lane packing) on both nets
    "s2d_stem_lr0": {"sampler": "band64x416c208l192", "lr": 0.0,
                     "stem_pack": 1},
    "disp_only_s2d": {"convs_only": True, "nets": "disp", "stem_pack": 1},
    "pose_only_s2d": {"convs_only": True, "nets": "pose", "stem_pack": 1},
    "b16_gather": {"batch": 16, "sampler": "gather", "fused": 8,
                   "augment": False},
    "b16_convs": {"batch": 16, "convs_only": True, "fused": 8,
                  "augment": False},
    # round-5: tile/row sweep under the canonical-taps formulation
    "band64r16x368c208l192_lr0": {"sampler": "band64r16x368c208l192",
                                  "lr": 0.0},
    "band80r16x368c208l192_lr0": {"sampler": "band80r16x368c208l192",
                                  "lr": 0.0},
    "band96r16x368c208l192_lr0": {"sampler": "band96r16x368c208l192",
                                  "lr": 0.0},
    "band96r32x368c208l192_lr0": {"sampler": "band96r32x368c208l192",
                                  "lr": 0.0},
    "r50_band64r16_lr0": {"layers": 50, "sampler": "band64r16x368c208l192",
                          "lr": 0.0},
    "r50_band80r16_lr0": {"layers": 50, "sampler": "band80r16x368c208l192",
                          "lr": 0.0},
    "disp_fwd_only": {"convs_only": True, "nets": "disp", "fwd_only": True},
    "pose_fwd_only": {"convs_only": True, "nets": "pose", "fwd_only": True},
    "disp_fwd_only_r50": {"convs_only": True, "nets": "disp",
                          "layers": 50, "fwd_only": True},
    # honest rung costs for the r16 ladder economics
    "band192r16nf_lr0": {"sampler": "band192r16nf", "lr": 0.0},
    "band192nf_lr0": {"sampler": "band192nf", "lr": 0.0},
    "band64x368c104l192_lr0": {"sampler": "band64x368c104l192", "lr": 0.0},
    "band48x368c208l192_lr0": {"sampler": "band48x368c208l192", "lr": 0.0},
    # round-5: r50 decomposition (pose stays r18 — reference parity)
    "convs_only_r50": {"convs_only": True, "layers": 50},
    "disp_only_r50": {"convs_only": True, "nets": "disp", "layers": 50},
    "disp_only_r50_unpacked": {"convs_only": True, "nets": "disp",
                               "layers": 50, "packed_decoder": False},
    # decoder pack-cap sweeps (r50 skip concats are 4x wider than r18)
    "disp_only_r50_nopack2": {"convs_only": True, "nets": "disp",
                              "layers": 50, "dec_pack_caps": (8, 4, 1, 1, 1)},
    "disp_only_r50_pack884": {"convs_only": True, "nets": "disp",
                              "layers": 50, "dec_pack_caps": (8, 8, 4, 1, 1)},
    # round-5b: loss-component splits at the PRODUCTION sampler
    "prod_no_ssim_lr0": {"sampler": "band80r16x368c208l192", "lr": 0.0,
                         "ssim": False},
    "prod_no_masks_lr0": {"sampler": "band80r16x368c208l192", "lr": 0.0,
                          "mask": False, "auto_mask": False},
    "prod_no_smooth_lr0": {"sampler": "band80r16x368c208l192", "lr": 0.0,
                           "no_smooth": True},
    "prod5_plain_l1_lr0": {"sampler": "band80r16x368c208l192", "lr": 0.0,
                           "ssim": False, "mask": False,
                           "auto_mask": False, "no_smooth": True},
    # round-5b: encoder-only splits (decoder cost = disp_only - enc_only)
    "enc_only": {"enc_only": True},
    "enc_only_r50": {"enc_only": True, "layers": 50},
    "enc_fwd_only": {"enc_only": True, "fwd_only": True},
    "enc_fwd_only_r50": {"enc_only": True, "layers": 50,
                         "fwd_only": True},
    "enc_only_r50_unpacked": {"enc_only": True, "layers": 50,
                              "packed": False},
}


def measure(name: str, n: int) -> float:
    t_build = time.perf_counter()
    step, state, batch, pick = build(CONFIGS[name])
    state, m = step(state, batch)
    float(pick(m))
    compile_s = time.perf_counter() - t_build

    def chain(state, k):
        t0 = time.perf_counter()
        for _ in range(k):
            state, mm = step(state, batch)
        float(pick(mm))
        return state, time.perf_counter() - t0

    state, _ = chain(state, 2)  # settle (first post-warm chain can stall)
    slopes = []
    for _ in range(5):
        state, t2 = chain(state, 2)
        state, tn = chain(state, n)
        slope = (tn - t2) / (n - 2) / FUSED
        if slope > 0 and tn > 1.2 * t2:
            slopes.append(slope)
        if len(slopes) >= 3:
            break
    if not slopes:
        print(f"{name:18s} NO VALID SLOPE (tunnel busy?)", flush=True)
        return float("nan")
    slope = sorted(slopes)[len(slopes) // 2]
    spread = (max(slopes) - min(slopes)) / slope if len(slopes) > 1 else 0.0
    print(
        f"{name:18s} {slope * 1e3:8.1f} ms/step   "
        f"({B / slope:6.1f} snippets/s)  "
        f"[compile+warm {compile_s:.0f}s, spread {spread:.1%}]",
        flush=True,
    )
    return slope


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="full,no_ssim,plain_l1,no_augment,"
                   "band32,convs_only")
    p.add_argument("--n", type=int, default=12)
    args = p.parse_args()
    for name in args.configs.split(","):
        try:
            measure(name.strip(), args.n)
        except Exception as e:  # keep going; report the failure
            print(f"{name:18s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
