"""reflect_pad custom-VJP primitives: values AND gradients must equal
jnp.pad(mode="reflect") exactly — the module only changes how XLA
schedules the cotangent accumulation, never the math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_sfmlearner_release_tpu.ops.reflect_pad import (
    reflect_pad1_h, reflect_pad1_hw, reflect_pad1_hw4,
)


def _ref_pad(x, axes):
    cfg = [(1, 1) if i in axes else (0, 0) for i in range(x.ndim)]
    return jnp.pad(x, cfg, mode="reflect")


CASES = [
    (reflect_pad1_h, (2, 5, 4, 3), (1,)),
    (reflect_pad1_h, (1, 2, 3, 2), (1,)),  # minimal H=2
    (reflect_pad1_hw, (3, 6, 5), (1, 2)),
    (reflect_pad1_hw, (2, 2, 2), (1, 2)),
    (reflect_pad1_hw4, (2, 4, 6, 3), (1, 2)),
    (reflect_pad1_hw4, (1, 2, 2, 1), (1, 2)),
    # size-1 axes: reflect degrades to edge replication (decoder
    # bottleneck stage on tiny inputs, e.g. H/32 == 1)
    (reflect_pad1_h, (1, 1, 3, 2), (1,)),
    (reflect_pad1_hw, (2, 1, 3), (1, 2)),
    (reflect_pad1_hw4, (1, 1, 2, 512), (1, 2)),
    (reflect_pad1_hw4, (1, 3, 1, 4), (1, 2)),
]


@pytest.mark.parametrize("fn,shape,axes", CASES)
def test_forward_matches_jnp_pad(fn, shape, axes):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
    np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(_ref_pad(x, axes)))


@pytest.mark.parametrize("fn,shape,axes", CASES)
def test_gradient_matches_jnp_pad(fn, shape, axes):
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(*shape), jnp.float32)
    # random cotangent so every output element's contribution is checked
    out_shape = tuple(
        s + 2 if i in axes else s for i, s in enumerate(shape)
    )
    ct = jnp.asarray(r.randn(*out_shape), jnp.float32)
    g_new = jax.grad(lambda a: jnp.sum(fn(a) * ct))(x)
    g_ref = jax.grad(lambda a: jnp.sum(_ref_pad(a, axes) * ct))(x)
    # Regular axes accumulate ONE boundary cotangent per row/column —
    # bit-exact. A size-1 padded axis folds three cotangents into the
    # same element, where summation order differs from jnp.pad's
    # lowering by one fp32 rounding.
    degenerate = any(shape[a] == 1 for a in axes)
    tol = dict(rtol=1e-5, atol=0) if degenerate else dict(rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), **tol)
