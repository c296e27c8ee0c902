"""Worker process for the 2-process jax.distributed multi-host test.

Run by tests/test_multihost.py as `python multihost_worker.py <pid> <port>
<workdir>`. Exercises the real multi-host seams on a fake 2-host CPU
cluster (4 virtual devices per process, gloo cross-process collectives):

  1. `split_by_host` shard assignment is disjoint and covering — a
     double-read or dropped shard fails the union/intersection check;
  2. the tar-shard read path under per-host splitting: the union of
     sample keys read by both hosts equals the full dataset exactly;
  3. orbax save/restore of a TrainState sharded over the GLOBAL mesh:
     every process holds only its addressable shards, saves cooperate,
     and a restore into a differently-initialized template round-trips;
  4. ONE real train step over a global (data=2, fsdp=4) mesh whose data
     axis crosses the process boundary — gradient all-reduce rides the
     cross-process collective path. test_multihost.py asserts the
     resulting loss/grad-norm match a single-process run of the identical
     setup, so a wrong cross-host grad sync or batch split fails loudly.

Reference role: wds.split_by_node + torch.distributed checkpoint saves +
the DDP training loop (m2t/data_modules.py:430-495, m2t/train.py rank-0
saving, m2t/train.py:255-260).

NOT a pytest module (module-level side effects: distributed init).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


TRAIN_PATCH_ID = 7


def tiny_train_setup():
    """Deterministic tiny model + batch + optimizer, constructed
    identically by every worker process AND by test_multihost.py's
    single-process reference — the shared ground for the step-parity
    check (no file passing, no RNG divergence)."""
    import numpy as np

    from llark_tpu.config import ModelConfig, TrainingArguments
    from llark_tpu.models.fusion import init_llark_params
    from llark_tpu.special_tokens import IGNORE_INDEX
    from llark_tpu.train.step import make_optimizer

    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B, S, T = 8, 16, 2
    ids = np.full((B, S), 3, np.int32)
    ids[:, 1 : 1 + T] = TRAIN_PATCH_ID
    labels = np.where(np.arange(S)[None, :] >= S // 2, ids, IGNORE_INDEX)
    batch = {
        "input_ids": ids,
        "labels": labels.astype(np.int32),
        "seq_lengths": np.full((B,), S, np.int32),
        "audio_encodings": rng.randn(B, T, cfg.mm_hidden_size).astype(np.float32),
        "audio_frame_counts": np.full((B,), T, np.int32),
    }
    opt = make_optimizer(
        TrainingArguments(max_steps=10, learning_rate=1e-3), params
    )
    return cfg, params, batch, opt


def barrier(name: str):
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def main():
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert jax.process_index() == pid
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from llark_tpu.data.records import make_shard_reader
    from llark_tpu.data.shards import expand_url_to_file_list, split_by_host
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.train.checkpoint import CheckpointManager
    from llark_tpu.train.state import TrainState

    # --- 1+2: per-host shard assignment over real tar shards ---------------
    n_shards, per_shard = 5, 3
    if pid == 0:
        w = TarShardWriter(
            os.path.join(workdir, "shard-%05d.tar"), max_count=per_shard
        )
        for i in range(n_shards * per_shard):
            w.write({"__key__": f"sample{i:04d}", "json": {"id": i}})
        w.close()
    barrier("shards_written")

    urls = expand_url_to_file_list(
        os.path.join(workdir, "shard-{00000..%05d}.tar" % (n_shards - 1))
    )
    assert len(urls) == n_shards, urls
    mine = split_by_host(urls)  # uses jax.process_index()/count()
    keys = sorted(s["__key__"] for s in make_shard_reader(mine))

    with open(os.path.join(workdir, f"keys_{pid}.json"), "w") as f:
        json.dump({"urls": mine, "keys": keys}, f)
    barrier("keys_written")

    host = [json.load(open(os.path.join(workdir, f"keys_{p}.json"))) for p in (0, 1)]
    all_urls = host[0]["urls"] + host[1]["urls"]
    assert len(all_urls) == len(set(all_urls)), "shard double-assigned"
    assert sorted(all_urls) == sorted(urls), "shard dropped"
    all_keys = host[0]["keys"] + host[1]["keys"]
    assert len(all_keys) == len(set(all_keys)), "sample double-read"
    assert len(all_keys) == n_shards * per_shard, "samples dropped"

    # --- 3: orbax save/restore of a globally-sharded TrainState ------------
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))

    def ensure_on_mesh(x):
        # same replication step train.py applies before checkpointing
        # (train/train.py ensure_on_mesh): host-local scalars (step, opt
        # counts) are not serializable in multi-host orbax
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return x
        return jax.device_put(x, NamedSharding(mesh, P()))

    def make_state(fill: float) -> TrainState:
        w_np = np.arange(16, dtype=np.float32) * fill
        local = w_np[pid * 8 : (pid + 1) * 8]
        w = jax.make_array_from_process_local_data(sh, local, (16,))
        params = {"w": w}
        opt = optax.sgd(1e-2)
        return jax.tree.map(ensure_on_mesh, TrainState.create(params, opt))

    state = make_state(fill=1.0).replace(
        step=ensure_on_mesh(jax.numpy.ones((), jax.numpy.int32) * 7)
    )
    ckpt_dir = os.path.join(workdir, "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(7, state, data_state={"seed": 0, "batches_seen": 3})
    mgr.wait()
    barrier("saved")
    assert mgr.latest_step() == 7

    template = make_state(fill=0.0)
    restored, data_state = mgr.restore(template)
    mgr.close()
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(restored.params["w"], tiled=True)
    np.testing.assert_allclose(np.asarray(gathered), np.arange(16, dtype=np.float32))
    assert int(restored.step) == 7
    assert data_state["batches_seen"] == 3
    # restored array keeps the global sharding: only local shards addressable
    addr = restored.params["w"].addressable_shards
    assert len(addr) == 4, addr

    # --- 4: one REAL cross-host train step (DCN grad-sync parity) ----------
    from llark_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        param_partition_specs,
        param_shardings,
    )
    from llark_tpu.train.step import make_train_step

    cfg, params, batch, opt = tiny_train_setup()
    # data axis (first) spans the process boundary: devices 0-3 are
    # process 0, 4-7 process 1 -> batch halves live on different hosts and
    # the grad all-reduce crosses processes
    gmesh = make_mesh((2, 4, 1))

    def to_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda i: x[i])

    gparams = jax.tree.map(
        to_global, params, param_shardings(gmesh, param_partition_specs(cfg))
    )
    gbatch = {k: to_global(v, batch_sharding(gmesh)(v)) for k, v in batch.items()}
    # optax.init eagerly zeros_like's each param — illegal on
    # non-fully-addressable arrays, so build the state under jit
    gstate = jax.jit(lambda p: TrainState.create(p, opt))(gparams)
    train_step = make_train_step(cfg, opt, audio_patch_id=TRAIN_PATCH_ID)
    with gmesh:
        _, m = jax.jit(train_step, donate_argnums=(0,))(gstate, gbatch)
    m = {k: float(jax.device_get(v)) for k, v in m.items()}
    with open(os.path.join(workdir, f"train_metrics_{pid}.json"), "w") as f:
        json.dump(m, f)
    barrier("train_step_done")

    barrier("done")
    print(f"MULTIHOST_OK pid={pid}")


if __name__ == "__main__":
    main()
