"""MXU-formulated bilinear grid sampling (gather-free, scatter-free).

Drop-in alternative to :func:`ops.grid_sample.grid_sample` with identical
semantics (torch ``grid_sample(align_corners=False)``, zeros/border padding
— /root/reference/inverse_warp.py:262,267) but built for how the TPU
actually executes.

Status: **tested alternative, NOT the default.** This round-1 UNBANDED
formulation contracts every output pixel's one-hot over the full source
height, i.e. ~H/band (≈4x at 256p with the production band=64) the banded
sampler's contraction FLOPs — it is strictly dominated by
``ops/warp_band.py`` and was never competitive once honest slope timing
landed. (Round 1's A/B printed "gather 2.45 ms/step": that number was an
enqueue-rate artifact of ``block_until_ready`` being a no-op over the
tunneled TPU and was discredited in round 2 — the slope-timed full-step
numbers at the canonical config are gather 487 ms/step vs the production
banded ladder 90.2, docs/DESIGN.md §1.) Kept (with full value/grad tests
vs the gather path) as the simplest scatter-free formulation and the
ancestor of the banded production sampler.

The formulation — dense contractions instead of gather/scatter:

* **Horizontal taps on the MXU.** For a chunk of output pixels covering a
  few raster rows, a *binary* one-hot matrix ``[P, W+1]`` (row p has a
  single 1 at column ``x0(p)+1``; the +1 offset makes the left-edge case
  representable) contracts a narrow band of source rows paired with its
  one-column-shifted copy — one matmul yields both x-taps. Binary one-hots
  are exact in bf16, so the MXU runs at full rate with no weight rounding.
* **Bilinear weights on the VPU, fp32.** The x-weights combine the two tap
  planes and the y-weights reduce over the band, both in float32 —
  interpolation weights never round.
* **Static row bands.** The chunk covering output rows ``[r0, r0+R)``
  reads source rows around ``r0*H/Ho`` (video ego-motion warps displace
  pixels vertically by only a few rows). Correctness is never compromised:
  one global ``lax.cond`` checks that every used source row falls inside
  its chunk's band and falls back to the exact gather formulation for the
  whole call otherwise (rare: extreme poses / tiny depths).

Both stages transpose to dense contractions under autodiff, so the backward
pass has **no scatter-add** — the depth-warp gradient (the hot gradient path
of the geometry-consistency loss) is a transposed matmul. Operand
(source-image) gradients round to bf16 at the cast boundary (~0.4%,
standard bf16-training behavior); coordinate gradients combine in fp32.

Precision: with ``precision="bf16"`` (default) source *values* round to
bf16 (~4e-3 absolute on [0,1]-range images; weights stay exact). With
``precision="fp32"`` each channel is split into bf16 hi/lo parts sampled as
separate channels and recombined (sampling is linear), giving ~1e-6
agreement with the gather implementation at ~2x the channel cost — no
6-pass HIGHEST matmuls needed. Gradients flow through the lo part
(an identity shift), so they are exact too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    # align_corners=False: -1 maps to -0.5, +1 maps to size - 0.5.
    return ((coord + 1.0) * size - 1.0) / 2.0


def _split_hi_lo(x: jax.Array) -> jax.Array:
    """Split channels into exactly-representable bf16 hi + residual lo.

    ``x == hi + lo`` with ``hi`` bf16-exact and ``|lo| <~ 4e-3 |x|`` (so the
    lo part's own bf16 rounding is ~1e-5 relative). The hi part is wrapped
    in stop_gradient, so d(out)/dx flows through lo alone — exactly 1.
    """
    hi = jax.lax.stop_gradient(
        x.astype(jnp.bfloat16).astype(x.dtype)
    )
    lo = x - hi
    return jnp.concatenate([hi, lo], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("padding_mode", "band", "rows_per_chunk",
                              "precision")
)
def grid_sample_mxu(
    img: jax.Array,
    coords: jax.Array,
    padding_mode: str = "zeros",
    band: int = 32,
    rows_per_chunk: int = 8,
    precision: str = "bf16",
) -> jax.Array:
    """Bilinear sample ``img`` at normalized ``coords`` via MXU contractions.

    Args/semantics identical to :func:`ops.grid_sample.grid_sample`:
    ``img [B, H, W, C]``, ``coords [B, Ho, Wo, 2]`` normalized (x, y) with
    align_corners=False; returns ``[B, Ho, Wo, C]``.

    ``band``: static source-row window per chunk. Must exceed
    ``rows_per_chunk * H / Ho``; the margin is the vertical-displacement
    budget before the exact full-call fallback triggers.
    ``rows_per_chunk``: output rows contracted per scan step.
    ``precision``: "bf16" (source values round to bf16) or "fp32"
    (hi/lo-split channels, ~1e-6, ~2x cost).
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    out_dtype = img.dtype
    c_in = img.shape[3]
    if precision == "fp32":
        img = _split_hi_lo(img.astype(jnp.float32))
    elif precision != "bf16":
        raise ValueError(f"unsupported precision: {precision}")

    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    compute = coords.dtype

    x = _unnormalize(coords[..., 0].astype(compute), w)
    y = _unnormalize(coords[..., 1].astype(compute), h)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    x0f, y0f = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0f, y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    if padding_mode == "zeros":
        vx0 = (x0 >= 0) & (x0 <= w - 1)
        vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
        vy0 = (y0 >= 0) & (y0 <= h - 1)
        vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    else:
        ones = jnp.ones(x0.shape, bool)
        vx0 = vx1 = vy0 = vy1 = ones

    y0g = jnp.clip(y0, 0, h - 1)
    y1g = jnp.clip(y0 + 1, 0, h - 1)

    band = min(band, h)
    rows_per_chunk = min(rows_per_chunk, ho)
    ho_pad = (-ho) % rows_per_chunk
    nchunk = (ho + ho_pad) // rows_per_chunk
    p = rows_per_chunk * wo

    # Static band start per chunk: the chunk's own rows mapped into source
    # row space, remaining margin split evenly.
    starts = []
    for ci in range(nchunk):
        src_lo = (ci * rows_per_chunk * h) // ho
        src_hi = ((ci + 1) * rows_per_chunk * h + ho - 1) // ho
        margin = band - (src_hi - src_lo)
        s = src_lo - margin // 2
        starts.append(max(0, min(s, h - band)))
    starts = jnp.asarray(starts, jnp.int32)  # [nchunk]

    def flat(a, fill):
        a = a.reshape(b, ho, wo)
        if ho_pad:
            a = jnp.pad(a, ((0, 0), (0, ho_pad), (0, 0)),
                        constant_values=fill)
        return a.reshape(b, nchunk, p).swapaxes(0, 1)  # [nchunk, B, P]

    xs = (
        flat(x0, 0), flat(wx, 0.0),
        flat(y0g, 0), flat(y1g, 0), flat(wy, 0.0),
        flat(vx0, False), flat(vx1, False),
        flat(vy0, False), flat(vy1, False),
        starts,
    )

    src = img.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # [B, C, H, W]

    @jax.checkpoint
    def step(carry, inp):
        x0c, wxc, y0c, y1c, wyc, a0, a1, b0, b1, s = inp
        window = jax.lax.dynamic_slice_in_dim(src, s, band, axis=2)
        # Pair the window with its one-column-shifted copy so a single
        # binary one-hot (at x0+1 over W+1 columns) yields both x-taps.
        zero_col = jnp.zeros(window.shape[:-1] + (1,), window.dtype)
        w_tap0 = jnp.concatenate([zero_col, window], axis=-1)   # col we -> we-1
        w_tap1 = jnp.concatenate([window, zero_col], axis=-1)   # col we -> we
        window_pair = jnp.concatenate([w_tap0, w_tap1], axis=2)  # [B,C,2K,W+1]

        wio = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w + 1), 2)
        onehot = (wio == (x0c + 1)[:, :, None]).astype(jnp.bfloat16)
        cols = jnp.einsum(
            "bpw,bckw->bpck",
            onehot,
            window_pair,
            preferred_element_type=jnp.float32,
        )  # [B, P, C, 2K] float32 — cols[..., :K] = x0 tap, [..., K:] = x1 tap

        # Bilinear weights in fp32 on the VPU (never rounded).
        w_x0 = jnp.where(a0, 1.0 - wxc, 0.0)[:, :, None, None]
        w_x1 = jnp.where(a1, wxc, 0.0)[:, :, None, None]
        colsx = w_x0 * cols[..., :band] + w_x1 * cols[..., band:]

        kio = jax.lax.broadcasted_iota(jnp.int32, (1, 1, band), 2)
        rel0 = jnp.clip(y0c - s, 0, band - 1)[:, :, None]
        rel1 = jnp.clip(y1c - s, 0, band - 1)[:, :, None]
        w_y0 = jnp.where(b0, 1.0 - wyc, 0.0)[:, :, None]
        w_y1 = jnp.where(b1, wyc, 0.0)[:, :, None]
        sel_y = (w_y0 * (kio == rel0) + w_y1 * (kio == rel1)).astype(
            jnp.float32
        )  # [B, P, band]
        out = jnp.sum(sel_y[:, :, None, :] * colsx, axis=-1)  # [B, P, C]
        return carry, out

    def band_path():
        _, outs = jax.lax.scan(step, 0, xs)  # [nchunk, B, P, C]
        out = outs.swapaxes(0, 1).reshape(b, nchunk * rows_per_chunk, wo, c)
        return out[:, :ho]

    def finish(out):
        if precision == "fp32":
            out = out[..., :c_in] + out[..., c_in:]
        return out.astype(out_dtype)

    if band >= h:
        return finish(band_path())

    # Global exactness check: every source row used with nonzero weight must
    # fall inside its chunk's static band; otherwise fall back to the exact
    # gather formulation for this call (rare: extreme poses / tiny depths).
    s_full = starts[:, None, None]  # [nchunk, 1, 1]
    in0 = (~xs[7]) | ((xs[2] >= s_full) & (xs[2] <= s_full + band - 1))
    in1 = (~xs[8]) | ((xs[3] >= s_full) & (xs[3] <= s_full + band - 1))
    fits = jnp.all(in0) & jnp.all(in1)

    def gather_path():
        from .grid_sample import grid_sample

        return grid_sample(
            img.astype(jnp.float32), coords, padding_mode=padding_mode
        )

    return finish(jax.lax.cond(fits, band_path, gather_path))
