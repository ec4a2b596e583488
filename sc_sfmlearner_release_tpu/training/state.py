"""Train state: parameters, BN statistics, optimizer state, step, RNG.

Unlike the reference — which checkpoints only model weights and cannot
resume the optimizer (/root/reference/train.py:219-227, SURVEY.md §5.4) —
the full state here is one pytree, so checkpoint/resume is exact.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any  # {"disp": ..., "pose": ...}
    batch_stats: Any  # {"disp": ..., "pose": ...}
    opt_state: Any
    rng: jax.Array


def create_train_state(
    disp_model,
    pose_model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    # init shapes only determine channel counts; small is fast to trace
    image_shape=(1, 64, 64, 3),
    disp_variables: Optional[Any] = None,
    pose_variables: Optional[Any] = None,
) -> TrainState:
    """Initialize both networks (or adopt converted/pretrained variables)
    and the optimizer.

    The reference builds one Adam over both nets' parameters with a shared
    learning rate (/root/reference/train.py:172-178); here the optimizer
    runs over the combined ``{"disp", "pose"}`` tree.
    """
    dummy = jnp.zeros(image_shape, jnp.float32)
    rng, k1, k2 = jax.random.split(rng, 3)

    # jit the initializers: eager per-op dispatch of ~60 convs is orders of
    # magnitude slower than one compiled program.
    if disp_variables is None:
        disp_variables = jax.jit(
            lambda k, x: disp_model.init(k, x, train=True)
        )(k1, dummy)
    if pose_variables is None:
        pose_variables = jax.jit(
            lambda k, x: pose_model.init(k, x, x, train=True)
        )(k2, dummy)

    params = {
        "disp": disp_variables["params"],
        "pose": pose_variables["params"],
    }
    batch_stats = {
        "disp": disp_variables.get("batch_stats", {}),
        "pose": pose_variables.get("batch_stats", {}),
    }
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=rng,
    )


def make_optimizer(
    lr: float = 1e-4,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam matching the reference's solver (/root/reference/train.py:176-178).

    torch.optim.Adam treats weight_decay as L2 added to the gradient, which
    is optax.add_decayed_weights *before* the Adam scaling.
    """
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(lr, b1=beta1, b2=beta2),
        )
    return optax.adam(lr, b1=beta1, b2=beta2)
