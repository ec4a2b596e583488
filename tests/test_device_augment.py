"""Device-side augmentation (data/device_augment.py).

Checks the jitted flip/scale-crop/normalize against the host transforms'
semantics (reference: /root/reference/custom_transforms.py:46-84): identity
draws are a no-op, flip matches an exact array flip + cx mirror, the affine
resample evaluates the correct input coordinates (exact on images that are
linear in x and y), intrinsics updates keep the camera model consistent
with the resampled pixels, and the keyed entry point is deterministic and
per-sample random.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_sfmlearner_release_tpu.data.device_augment import (
    AugmentConfig,
    augment_with_draws,
    make_device_augment,
    normalize_batch,
    sample_draws,
)
from sc_sfmlearner_release_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)

B, N, H, W = 3, 2, 32, 48


def _batch(rng=None, linear=False):
    rng = rng or np.random.RandomState(0)
    if linear:
        # Images linear in (x, y): bilinear resampling is exact on these.
        x = np.arange(W, dtype=np.float32)[None, :] / W
        y = np.arange(H, dtype=np.float32)[:, None] / H
        img = np.stack([x + 0 * y, 0 * x + y, 0.3 + 0.2 * x + 0.1 * y], -1)
        tgt = np.broadcast_to(img, (B, H, W, 3)).copy()
        refs = np.broadcast_to(img, (B, N, H, W, 3)).copy()
    else:
        tgt = rng.rand(B, H, W, 3).astype(np.float32)
        refs = rng.rand(B, N, H, W, 3).astype(np.float32)
    K = np.tile(
        np.array([[30.0, 0, W / 2], [0, 25.0, H / 2 + 1], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    return {"tgt": jnp.asarray(tgt), "refs": jnp.asarray(refs),
            "intrinsics": jnp.asarray(K)}


def _draws(flip=False, sx=1.0, sy=1.0, ox01=0.0, oy01=0.0):
    return {
        "flip": jnp.full((B,), flip, bool),
        "scales": jnp.tile(jnp.asarray([[sx, sy]], jnp.float32), (B, 1)),
        "offsets01": jnp.tile(jnp.asarray([[ox01, oy01]], jnp.float32), (B, 1)),
    }


def _denorm(x):
    return np.asarray(x) * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)


def test_identity_draws_are_noop():
    batch = _batch()
    out = augment_with_draws(batch, _draws(), AugmentConfig())
    np.testing.assert_allclose(_denorm(out["tgt"]), batch["tgt"], atol=1e-5)
    np.testing.assert_allclose(_denorm(out["refs"]), batch["refs"], atol=1e-5)
    np.testing.assert_allclose(out["intrinsics"], batch["intrinsics"], atol=1e-4)


def test_flip_matches_array_flip_and_mirrors_cx():
    batch = _batch()
    out = augment_with_draws(batch, _draws(flip=True), AugmentConfig())
    np.testing.assert_allclose(
        _denorm(out["tgt"]), np.asarray(batch["tgt"])[:, :, ::-1], atol=1e-5
    )
    np.testing.assert_allclose(
        _denorm(out["refs"]), np.asarray(batch["refs"])[:, :, :, ::-1], atol=1e-5
    )
    # cx -> W - cx (reference custom_transforms.py:55), fx/fy unchanged.
    K = np.asarray(batch["intrinsics"])
    Ko = np.asarray(out["intrinsics"])
    np.testing.assert_allclose(Ko[:, 0, 2], W - K[:, 0, 2], atol=1e-4)
    np.testing.assert_allclose(Ko[:, 0, 0], K[:, 0, 0], atol=1e-4)
    np.testing.assert_allclose(Ko[:, 1], K[:, 1], atol=1e-4)


def test_scale_crop_affine_is_exact_on_linear_images():
    batch = _batch(linear=True)
    sx, sy, ox01, oy01 = 1.12, 1.07, 0.6, 0.3
    out = augment_with_draws(batch, _draws(False, sx, sy, ox01, oy01),
                             AugmentConfig())

    # Resolve the draws the way the host path would: integer zoomed size,
    # integer offsets in [0, scaled - in].
    scaled_w, scaled_h = np.floor(W * sx), np.floor(H * sy)
    sx_eff, sy_eff = scaled_w / W, scaled_h / H
    ox = np.floor(ox01 * (scaled_w - W + 1))
    oy = np.floor(oy01 * (scaled_h - H + 1))

    xs = np.arange(W)[None, :]
    ys = np.arange(H)[:, None]
    in_x = (xs + ox + 0.5) / sx_eff - 0.5
    in_y = (ys + oy + 0.5) / sy_eff - 0.5
    # Linear channels: ch0 = in_x/W, ch1 = in_y/H (exact under bilinear,
    # away from the clamped border).
    got = _denorm(out["tgt"])[0]
    np.testing.assert_allclose(
        got[1:-1, 1:-1, 0], np.broadcast_to(in_x / W, (H, W))[1:-1, 1:-1],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        got[1:-1, 1:-1, 1], np.broadcast_to(in_y / H, (H, W))[1:-1, 1:-1],
        atol=1e-5,
    )

    # Intrinsics: zoom scales rows by the effective scale, crop shifts c.
    K = np.asarray(batch["intrinsics"])[0]
    Ko = np.asarray(out["intrinsics"])[0]
    np.testing.assert_allclose(Ko[0, 0], K[0, 0] * sx_eff, rtol=1e-5)
    np.testing.assert_allclose(Ko[1, 1], K[1, 1] * sy_eff, rtol=1e-5)
    np.testing.assert_allclose(Ko[0, 2], K[0, 2] * sx_eff - ox, rtol=1e-5)
    np.testing.assert_allclose(Ko[1, 2], K[1, 2] * sy_eff - oy, rtol=1e-5)


def test_projection_stays_consistent_with_resampled_pixels():
    """A 3D point projecting to pixel p in the original camera must project
    to the affine image of p in the augmented camera — for flip, scale-crop,
    and their composition."""
    batch = _batch()
    cases = [
        _draws(flip=True),
        _draws(False, 1.10, 1.13, 0.4, 0.8),
        _draws(True, 1.10, 1.13, 0.4, 0.8),
    ]
    pts = np.array([[1.3, -0.7, 5.0], [-0.5, 0.4, 3.0]], np.float32)
    for draws in cases:
        out = augment_with_draws(batch, draws, AugmentConfig())
        K = np.asarray(batch["intrinsics"])[0]
        Ko = np.asarray(out["intrinsics"])[0]

        sx, sy = np.asarray(draws["scales"])[0]
        scaled_w, scaled_h = np.floor(W * sx), np.floor(H * sy)
        sx_eff, sy_eff = scaled_w / W, scaled_h / H
        ox = np.floor(float(draws["offsets01"][0, 0]) * (scaled_w - W + 1))
        oy = np.floor(float(draws["offsets01"][0, 1]) * (scaled_h - H + 1))
        flip = bool(draws["flip"][0])

        for X in pts:
            p = K @ X
            px, py = p[0] / p[2], p[1] / p[2]
            # Forward affine on pixel coords: flip, then zoom+crop.
            # Flip mirrors about the image center in continuous coords
            # (cx -> W - cx convention).
            if flip:
                px = W - px
            exp_x = px * sx_eff - ox
            exp_y = py * sy_eff - oy

            q = Ko @ np.array([-X[0] if flip else X[0], X[1], X[2]])
            np.testing.assert_allclose(q[0] / q[2], exp_x, rtol=1e-4)
            np.testing.assert_allclose(q[1] / q[2], exp_y, rtol=1e-4)


def test_keyed_augment_deterministic_and_per_sample():
    batch = _batch()
    aug = make_device_augment(AugmentConfig())
    key = jax.random.PRNGKey(7)
    out1 = jax.jit(aug)(key, batch)
    out2 = jax.jit(aug)(key, batch)
    np.testing.assert_array_equal(out1["tgt"], out2["tgt"])

    # Identical input images across the batch still get distinct draws.
    same = {
        "tgt": jnp.broadcast_to(batch["tgt"][0], batch["tgt"].shape),
        "refs": jnp.broadcast_to(batch["refs"][0], batch["refs"].shape),
        "intrinsics": batch["intrinsics"],
    }
    out = jax.jit(aug)(key, same)
    K = np.asarray(out["intrinsics"])
    assert not np.allclose(K[0], K[1]) or not np.allclose(K[1], K[2])


def test_draw_distribution_respects_config():
    draws = sample_draws(jax.random.PRNGKey(0), 512, AugmentConfig())
    s = np.asarray(draws["scales"])
    assert s.min() >= 1.0 and s.max() <= 1.15
    f = np.asarray(draws["flip"]).mean()
    assert 0.35 < f < 0.65

    off = AugmentConfig(flip=False, scale_crop=False)
    draws = sample_draws(jax.random.PRNGKey(0), 64, off)
    assert not np.asarray(draws["flip"]).any()
    np.testing.assert_array_equal(np.asarray(draws["scales"]), 1.0)


def test_normalize_batch_matches_host_normalize():
    batch = _batch()
    out = normalize_batch({"tgt": batch["tgt"]})
    exp = (np.asarray(batch["tgt"]) - np.asarray(IMAGENET_MEAN)) / np.asarray(
        IMAGENET_STD
    )
    np.testing.assert_allclose(out["tgt"], exp, atol=1e-6)


@pytest.mark.slow
@pytest.mark.fullopt
def test_train_step_with_device_augment_on_mesh():
    """Full jitted train step with in-step augmentation over the 8-device
    CPU mesh: compiles, runs, loss finite, step advances."""
    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.parallel import (
        make_mesh, replicate, shard_batch,
    )
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multiple devices")

    hh, ww = 32, 64  # model path needs dims divisible by 2**5
    disp = DispNet(num_layers=18)
    pose = PoseNet(num_layers=18)
    tx = make_optimizer(1e-4, 0.9, 0.999, 0.0)
    state = create_train_state(disp, pose, tx, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices()[:n_dev])
    state = replicate(state, mesh)

    aug = make_device_augment(AugmentConfig())
    step = make_train_step(disp, pose, tx, LossConfig(), augment_fn=aug,
                           aug_seed=3)

    rng = np.random.RandomState(0)
    batch = {
        "tgt": rng.rand(n_dev * 2, hh, ww, 3).astype(np.float32),
        "refs": rng.rand(n_dev * 2, N, hh, ww, 3).astype(np.float32),
        "intrinsics": np.tile(
            np.array([[30.0, 0, ww / 2], [0, 25.0, hh / 2], [0, 0, 1]],
                     np.float32),
            (n_dev * 2, 1, 1),
        ),
    }
    batch = shard_batch(batch, mesh)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_separable_resample_matches_grid_sample():
    """The MXU-contraction resample must reproduce the general bilinear
    sampler (border padding) exactly on the same separable affine grid."""
    from sc_sfmlearner_release_tpu.data.device_augment import (
        _affine_coords, _separable_resample,
    )
    from sc_sfmlearner_release_tpu.ops.grid_sample import grid_sample

    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.rand(B, H, W, 5).astype(np.float32))
    draws = {
        "flip": jnp.asarray([True, False, True]),
        "scales": jnp.asarray(rng.uniform(1.0, 1.15, (B, 2)), jnp.float32),
        "offsets01": jnp.asarray(rng.rand(B, 2), jnp.float32),
    }
    in_x, in_y, *_ = _affine_coords(draws, H, W)

    got = _separable_resample(frames, in_x, in_y)

    nx = (2.0 * in_x + 1.0) / W - 1.0
    ny = (2.0 * in_y + 1.0) / H - 1.0
    coords = jnp.stack(
        [jnp.broadcast_to(nx[:, None, :], (B, H, W)),
         jnp.broadcast_to(ny[:, :, None], (B, H, W))], axis=-1)
    want = grid_sample(frames, coords, padding_mode="border")

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)
