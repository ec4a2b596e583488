"""Golden tests: grid_sample vs torch.nn.functional.grid_sample (CPU).

The warp's bilinear sampler must match torch's ``align_corners=False``
semantics bit-for-bit in both value and gradient — it is the core op of the
photometric loss (reference: /root/reference/inverse_warp.py:262,267).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sc_sfmlearner_release_tpu.ops import grid_sample


def _torch_reference(img_nhwc, coords, padding_mode):
    timg = torch.tensor(np.transpose(img_nhwc, (0, 3, 1, 2)), requires_grad=True)
    tcoords = torch.tensor(coords, requires_grad=True)
    out = F.grid_sample(
        timg, tcoords, mode="bilinear",
        padding_mode=padding_mode, align_corners=False,
    )
    return timg, tcoords, out


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_torch_values(padding_mode):
    rng = np.random.RandomState(0)
    img = rng.rand(2, 5, 7, 3).astype(np.float32)
    # Cover in-bounds, out-of-bounds, and boundary-straddling samples.
    coords = (rng.rand(2, 4, 6, 2).astype(np.float32) - 0.5) * 3.0

    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords), padding_mode))
    _, _, out = _torch_reference(img, coords, padding_mode)
    want = np.transpose(out.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_matches_torch_gradients(padding_mode):
    rng = np.random.RandomState(1)
    img = rng.rand(2, 6, 8, 2).astype(np.float32)
    coords = (rng.rand(2, 3, 5, 2).astype(np.float32) - 0.5) * 2.6
    cot = rng.rand(2, 3, 5, 2).astype(np.float32)

    def loss(i, c):
        return jnp.sum(grid_sample(i, c, padding_mode) * jnp.asarray(cot))

    gi, gc = jax.grad(loss, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(coords))

    timg, tcoords, out = _torch_reference(img, coords, padding_mode)
    tcot = torch.tensor(np.transpose(cot, (0, 3, 1, 2)))
    (out * tcot).sum().backward()

    np.testing.assert_allclose(
        np.asarray(gi),
        np.transpose(timg.grad.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gc), tcoords.grad.numpy(), rtol=1e-4, atol=1e-4
    )


def test_identity_grid_recovers_image():
    rng = np.random.RandomState(2)
    b, h, w, c = 2, 8, 10, 3
    img = rng.rand(b, h, w, c).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xn = (2 * xs + 1) / w - 1
    yn = (2 * ys + 1) / h - 1
    coords = np.broadcast_to(
        np.stack([xn, yn], -1)[None].astype(np.float32), (b, h, w, 2)
    )
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(got, img, rtol=1e-5, atol=1e-5)


def test_far_out_of_bounds_is_zero():
    img = jnp.ones((1, 4, 4, 1), jnp.float32)
    coords = jnp.full((1, 2, 2, 2), 2.0, jnp.float32)  # the cam2pixel trick value
    out = grid_sample(img, coords, "zeros")
    np.testing.assert_allclose(np.asarray(out), 0.0)
