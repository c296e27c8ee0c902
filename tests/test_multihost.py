"""2-process jax.distributed multi-host story (VERDICT r1 item 10).

Spawns two real processes that form a fake 2-host cluster (gloo over
localhost, 4 virtual CPU devices each) and run tests/multihost_worker.py:
per-host shard assignment (disjoint + covering over real tar shards) and
cooperative orbax save/restore of a globally-sharded TrainState.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_and_checkpoint(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # the workers pin their own platform/devices; scrub the suite's 8-dev flag
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out

    # --- distributed train step == single-process reference ---------------
    # The workers ran one train step over a global (data=2, fsdp=4) mesh
    # whose data axis crosses the process boundary. Recompute the same step
    # single-process on this suite's 8 virtual devices and require
    # loss/grad-norm parity: a wrong cross-host grad sync, dropped batch
    # half, or double-counted all-reduce shifts both.
    import json

    import jax
    import numpy as np
    from multihost_worker import TRAIN_PATCH_ID, tiny_train_setup

    from llark_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        param_partition_specs,
        shard_params,
    )
    from llark_tpu.train.state import TrainState
    from llark_tpu.train.step import make_train_step

    m0 = json.load(open(tmp_path / "train_metrics_0.json"))
    m1 = json.load(open(tmp_path / "train_metrics_1.json"))
    # replicated metrics must agree bit-for-bit across hosts
    assert m0 == m1, (m0, m1)

    cfg, params, batch, opt = tiny_train_setup()
    mesh = make_mesh((2, 4, 1))
    sparams = shard_params(mesh, params, param_partition_specs(cfg))
    state = TrainState.create(sparams, opt)
    sbatch = {
        k: jax.device_put(v, batch_sharding(mesh)(v)) for k, v in batch.items()
    }
    train_step = make_train_step(cfg, opt, audio_patch_id=TRAIN_PATCH_ID)
    with mesh:
        _, ref = jax.jit(train_step)(state, sbatch)

    np.testing.assert_allclose(m0["loss"], float(ref["loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        m0["grad_norm"], float(ref["grad_norm"]), rtol=2e-5
    )
    assert m0["num_tokens"] == float(ref["num_tokens"])
