"""Worker for the REAL two-process multi-host test (test_multiprocess.py).

Each instance runs `jax.distributed.initialize` against a shared local
coordinator, loads its per-process slice of the global batch through the
production BatchLoader slicing, assembles the sharded global batch via
`parallel.shard_batch` (which routes through
`jax.make_array_from_process_local_data` when `process_count > 1` —
parallel/mesh.py), runs ONE production fused train step over the 2-device
global mesh, and dumps its view of the final (replicated) parameters.

This is the multi-host wiring of train.py:214-223 / data/loader.py:103-120
exercised by actual separate processes, not an in-process simulation.
"""

import argparse
import os
import sys

import numpy as np

H, W, B_GLOBAL, N_REFS = 32, 64, 2, 2


class SyntheticSequenceSet:
    """Deterministic tiny snippet dataset (same on every process)."""

    def __len__(self):
        return 8

    def load(self, index, rng):
        r = np.random.RandomState(1000 + index)
        k = np.array(
            [[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32
        )
        return {
            "tgt": r.rand(H, W, 3).astype(np.float32),
            "refs": r.rand(N_REFS, H, W, 3).astype(np.float32),
            "intrinsics": k,
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=1,
                   help="virtual CPU devices in THIS process (the test "
                        "sets xla_force_host_platform_device_count to "
                        "match) — >1 exercises the hybrid multi-host x "
                        "multi-device case: cross-process collectives "
                        "composing with intra-process sharding")
    p.add_argument("--global-batch", type=int, default=B_GLOBAL)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (
        f"expected {args.local_devices} global CPU device(s) per process, "
        f"got {jax.devices()}"
    )

    import jax.numpy as jnp  # noqa: F401

    from sc_sfmlearner_release_tpu.data.loader import BatchLoader
    from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
    from sc_sfmlearner_release_tpu.parallel import (
        make_mesh, replicate, shard_batch,
    )
    from sc_sfmlearner_release_tpu.training import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )

    disp, pose = DispNet(num_layers=18), PoseNet(num_layers=18)
    tx = make_optimizer(lr=1e-3)
    state = create_train_state(
        disp, pose, tx, jax.random.PRNGKey(0), image_shape=(1, H, W, 3)
    )

    mesh = make_mesh()  # 1-D data mesh over BOTH processes' devices
    state = replicate(state, mesh)
    step = make_train_step(disp, pose, tx, LossConfig())

    loader = BatchLoader(
        SyntheticSequenceSet(),
        batch_size=args.global_batch,
        shuffle=False,
        num_workers=1,
        drop_last=True,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    local_batch = next(iter(loader))
    local_batch.pop("_n_valid", None)
    assert local_batch["tgt"].shape[0] == (
        args.global_batch // args.num_processes
    )
    global_batch = shard_batch(local_batch, mesh)

    # AOT-compile BEFORE the coordination barrier: the first Gloo
    # collective rendezvous has a hard 30s key-exchange timeout, and two
    # processes compiling a multi-minute program on a contended host can
    # skew past it. Compiling first and then meeting at the (long-timeout,
    # gRPC) coordination-service barrier makes both processes hit the Gloo
    # init within milliseconds of each other.
    compiled = step.lower(state, global_batch).compile()
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        client.key_value_set(f"scsfm_compiled/{args.process_id}", "1")
        for peer in range(args.num_processes):
            if peer != args.process_id:
                client.blocking_key_value_get(
                    f"scsfm_compiled/{peer}", 900_000
                )
    except Exception as e:  # internal API moved — proceed unsynchronized
        print(f"[worker {args.process_id}] barrier skipped: {e}",
              flush=True)

    state, metrics = compiled(state, global_batch)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss), loss

    # Replicated leaves: every process holds a full local copy.
    leaves = [
        np.asarray(jax.device_get(x))
        for x in jax.tree_util.tree_leaves(state.params)
    ]
    np.savez(args.out, loss=np.float64(loss),
             **{f"leaf_{i}": a for i, a in enumerate(leaves)})
    print(f"[worker {args.process_id}] done, loss={loss}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
