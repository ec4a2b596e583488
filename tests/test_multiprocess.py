"""REAL two-process multi-host execution (SURVEY.md §5.8).

Spawns two actual OS processes that call `jax.distributed.initialize`
against a local coordinator (CPU backend, one device per process), feed
per-process loader slices through the production
`shard_batch` -> `jax.make_array_from_process_local_data` path
(parallel/mesh.py), and run one jitted train step over the global 2-device
mesh. Asserts both processes finish with IDENTICAL parameters that match
the single-process result on the same global batch — turning the
multi-host wiring of train.py:214-223 from "wired" into "proven".

The reference has no multi-process story at all (torch.nn.DataParallel
only, /root/reference/train.py:168-169).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(local_devices: int = 1) -> dict:
    env = dict(os.environ)
    # Isolated JAX config: plain CPU (``local_devices`` virtual devices
    # per process — the parent conftest's 8-virtual-device XLA_FLAGS must
    # not leak), full XLA optimization (GSPMD-partitioned programs abort
    # on XLA:CPU under jax_disable_most_optimizations), shared persistent
    # compile cache.
    env.pop("JAX_DISABLE_MOST_OPTIMIZATIONS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache"
    )
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    # Deliberately NOT inheriting the parent PYTHONPATH: site
    # customizations that import jax at interpreter startup (e.g. a TPU
    # tunnel shim) initialize the backend before the worker can call
    # jax.distributed.initialize, which then silently yields
    # process_count() == 1.
    env["PYTHONPATH"] = os.pathsep.join([os.path.dirname(HERE), HERE])
    return env


@pytest.mark.slow
@pytest.mark.parametrize(
    "local_devices,global_batch",
    [
        (1, 2),  # 2 processes x 1 device: pure multi-host
        # 2 processes x 2 virtual devices: real pods are N hosts x M local
        # chips — cross-process collectives must compose with intra-
        # process sharding (each process feeds a 2-sample slice of the
        # 4-sample global batch across its 2 local devices).
        (2, 4),
    ],
    ids=["2proc-x-1dev", "2proc-x-2dev-hybrid"],
)
def test_two_process_train_step_matches_single_process(
    tmp_path, local_devices, global_batch
):
    port = _free_port()
    env = _worker_env(local_devices)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"params_{pid}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.join(HERE, "mp_worker.py"),
                    "--coordinator", f"localhost:{port}",
                    "--process-id", str(pid),
                    "--num-processes", "2",
                    "--local-devices", str(local_devices),
                    "--global-batch", str(global_batch),
                    "--out", str(out),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    with np.load(outs[0]) as f0, np.load(outs[1]) as f1:
        # numeric sort: leaf_10 must follow leaf_9, matching tree order
        keys = sorted(
            (k for k in f0.files if k.startswith("leaf_")),
            key=lambda s: int(s.split("_")[1]),
        )
        assert keys and sorted(
            (k for k in f1.files if k.startswith("leaf_")),
            key=lambda s: int(s.split("_")[1]),
        ) == keys
        # Both processes computed the SAME program over the SAME global
        # mesh: their replicated parameter copies must agree bitwise.
        for k in keys:
            np.testing.assert_array_equal(f0[k], f1[k], err_msg=k)
        np.testing.assert_array_equal(f0["loss"], f1["loss"])

        # Single-process oracle: the same global batch through the same
        # step on one device. Global-batch semantics (sync-BN, mean grads)
        # make this the same computation up to fp32 reduction order.
        import jax
        from mp_worker import H, W, SyntheticSequenceSet

        B_GLOBAL = global_batch
        from sc_sfmlearner_release_tpu.data.loader import BatchLoader
        from sc_sfmlearner_release_tpu.models import DispNet, PoseNet
        from sc_sfmlearner_release_tpu.training import (
            LossConfig, create_train_state, make_optimizer, make_train_step,
        )

        disp, pose = DispNet(num_layers=18), PoseNet(num_layers=18)
        tx = make_optimizer(lr=1e-3)
        state = create_train_state(
            disp, pose, tx, jax.random.PRNGKey(0), image_shape=(1, H, W, 3)
        )
        step = make_train_step(disp, pose, tx, LossConfig())
        loader = BatchLoader(
            SyntheticSequenceSet(), batch_size=B_GLOBAL, shuffle=False,
            num_workers=1, drop_last=True,
        )
        batch = next(iter(loader))
        batch.pop("_n_valid", None)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

        # Same-computation-different-reduction-order: for near-zero-
        # gradient elements Adam's normalized update flips sign on ulp
        # noise (divergence up to 2*lr per step); bound elementwise by
        # that maximum and require the L2 disagreement to be a small
        # fraction of the update itself (as in
        # test_training.test_fused_steps_match_sequential).
        LR = 1e-3
        init = create_train_state(
            DispNet(num_layers=18), PoseNet(num_layers=18), tx,
            jax.random.PRNGKey(0), image_shape=(1, H, W, 3),
        )
        init_leaves = [
            np.asarray(x) for x in jax.tree_util.tree_leaves(init.params)
        ]
        leaves = [
            np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)
        ]
        assert len(leaves) == len(keys)
        diff_sq = upd_sq = 0.0
        for k, ref, i0 in zip(keys, leaves, init_leaves):
            np.testing.assert_array_less(
                np.abs(f0[k] - ref), 2 * LR + 1e-6, err_msg=k
            )
            diff_sq += float(np.sum((f0[k] - ref) ** 2))
            upd_sq += float(np.sum((ref - i0) ** 2))
        assert upd_sq > 0
        rel = np.sqrt(diff_sq / upd_sq)
        assert rel < 0.02, f"2-process vs 1-process trajectories: {rel:.4f}"
