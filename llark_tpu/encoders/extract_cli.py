"""Batch embedding extraction: a directory of WAVs -> per-file .npy.

Replaces the reference's L5 fan-out (jukebox/main.py:203-258 batch CLI,
jukebox/dataflow_inference.py Beam/Dataflow GPU fleet, and
scripts/clap/clap_embeddings.py) with one TPU-native CLI:

  python -m llark_tpu.encoders.extract_cli jukebox \
      --input-dir wavs/ --output-dir embeds/ \
      [--checkpoint vqvae.pth.tar --prior-checkpoint prior.pth.tar] \
      [--batch-size 2] [--num-shards 8 --shard-index 0]

  python -m llark_tpu.encoders.extract_cli clap \
      --input-dir wavs/ --output-dir embeds/ [--batch-size 16]

Scale-out model: the reference used up to 128 single-GPU Beam workers;
here one chip batches clips and pipelines host I/O against device compute
(encode_stream), and a fleet is expressed by running N processes with
--num-shards N --shard-index i (same contract as wds.split_by_node).
Output: `{basename}.npy` — [T_pooled, 4800] fp32 for Jukebox (fps=10),
[1, 512] for CLAP — matching the reference's file format so downstream
WDS packing is unchanged.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from typing import Iterator, List, Optional, Tuple

import numpy as np

from llark_tpu import storage

log = logging.getLogger("llark_tpu.extract")


def list_shard(input_dir: str, num_shards: int, shard_index: int,
               skip_existing: bool, output_dir: str) -> List[str]:
    files = sorted(
        f for f in os.listdir(input_dir) if f.lower().endswith(".wav")
    )
    files = files[shard_index::num_shards]
    if skip_existing:
        files = [
            f for f in files
            if not storage.exists(storage.join(output_dir, _npy_name(f)))
        ]
    return files


def _npy_name(wav_name: str) -> str:
    return os.path.splitext(wav_name)[0] + ".npy"


def _save_npy(path, arr):
    """np.save through the storage seam (gs:// outputs like the
    reference's Dataflow writers; m2t/gcs_utils.py:165-198)."""
    storage.makedirs_for(path)
    with storage.fopen(path, "wb") as f:
        np.save(f, arr)


def _batched(seq: List[str], n: int) -> Iterator[List[str]]:
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


# ---------------------------------------------------------------------------
# Jukebox
# ---------------------------------------------------------------------------


def build_jukebox_encoder(ns):
    from llark_tpu.encoders.jukebox.config import (
        JukeboxPriorConfig,
        JukeboxVQVAEConfig,
    )
    from llark_tpu.encoders.jukebox.encode import JukeboxEncoder

    kw = dict(
        pool_frames_per_second=ns.fps,
        transfer_dtype=ns.transfer_dtype,
        output_dtype=ns.output_dtype,
    )
    if ns.data_parallel:
        import jax

        from llark_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        kw["mesh"] = make_mesh((n, 1, 1))
        log.info("data-parallel encode over %d devices", n)
    if ns.checkpoint and ns.checkpoint.endswith(".npz"):
        # importer-produced bundle (weights + conditioner tables)
        enc = JukeboxEncoder.from_npz(ns.checkpoint, **kw)
        enc.prior_cfg.dtype = "bfloat16"
        return enc
    if ns.checkpoint:
        from llark_tpu.encoders.jukebox.import_torch import (
            convert_prior,
            convert_vqvae,
            infer_prior_config,
            strip_module,
        )
        import torch

        def load_sd(path):
            sd = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "model" in sd and not any(
                "." in k for k in sd  # official ckpts wrap: {"model": state_dict}
            ):
                sd = sd["model"]
            return strip_module(sd)

        vq_sd = load_sd(ns.checkpoint)
        pr_sd = load_sd(ns.prior_checkpoint)
        vq_cfg = JukeboxVQVAEConfig()
        pr_cfg = infer_prior_config(pr_sd, depth=ns.prior_depth)
        pr_cfg.dtype = "bfloat16"
        # x_cond/y_cond from the checkpoint's label conditioner (zeros only
        # when the tables are absent, e.g. truncated test fixtures)
        try:
            from llark_tpu.encoders.jukebox.conditioner import (
                convert_conditioner,
                dummy_metadata,
                get_cond,
                infer_conditioner_config,
            )

            cond_params = convert_conditioner(pr_sd)
            ccfg = infer_conditioner_config(cond_params, pr_cfg.n_ctx, pr_cfg.width)
            raw_to_tokens = 1
            for d, s in zip(vq_cfg.downs_t, vq_cfg.strides_t):
                raw_to_tokens *= s**d
            x_cond, y_cond = get_cond(ccfg, cond_params,
                                      dummy_metadata(ccfg, raw_to_tokens))
            kw.setdefault("x_cond", x_cond)
            kw.setdefault("y_cond", y_cond)
        except KeyError:
            log.warning("prior checkpoint has no y_emb.* conditioner tables; "
                        "using zero x_cond/y_cond")
        return JukeboxEncoder(
            vq_cfg, pr_cfg, convert_vqvae(vq_sd, vq_cfg),
            convert_prior(pr_sd, pr_cfg), **kw
        )
    log.warning("no --checkpoint given: RANDOM weights (throughput/dev only)")
    if ns.tiny:
        return JukeboxEncoder.random_init(
            JukeboxVQVAEConfig.tiny(), JukeboxPriorConfig.tiny(), **kw
        )
    return JukeboxEncoder.random_init(
        JukeboxVQVAEConfig(dtype="bfloat16"),
        JukeboxPriorConfig(dtype="bfloat16"),
        **kw,
    )


def run_jukebox(ns) -> int:
    from llark_tpu.audio.io import read_wav
    from llark_tpu.encoders.jukebox.encode import (
        JUKEBOX_SAMPLE_RATE,
        pad_or_crop,
        prepare_audio,
    )

    enc = build_jukebox_encoder(ns)
    os.makedirs(ns.output_dir, exist_ok=True)
    files = list_shard(ns.input_dir, ns.num_shards, ns.shard_index,
                       ns.skip_existing, ns.output_dir)
    log.info("shard %d/%d: %d files", ns.shard_index, ns.num_shards, len(files))

    def batches():
        for group in _batched(files, ns.batch_size):
            audio = np.zeros((ns.batch_size, enc.samples_per_ctx), np.float32)
            lengths = np.zeros((ns.batch_size,), np.int64)
            for i, name in enumerate(group):
                samples, _ = read_wav(
                    os.path.join(ns.input_dir, name), JUKEBOX_SAMPLE_RATE
                )
                prepared = prepare_audio(samples)
                lengths[i] = min(len(prepared), enc.samples_per_ctx)
                audio[i] = pad_or_crop(prepared, enc.samples_per_ctx)
            yield audio, lengths

    t0 = time.time()
    n_done = 0
    stream = enc.encode_stream(batches())
    for group, (acts, counts) in zip(_batched(files, ns.batch_size), stream):
        for i, name in enumerate(group):
            out = acts[i, : counts[i]].astype(np.float32)
            _save_npy(storage.join(ns.output_dir, _npy_name(name)), out)
            n_done += 1
    dt = time.time() - t0
    log.info("wrote %d embeddings in %.1fs (%.2f clips/s)", n_done, dt,
             n_done / max(dt, 1e-9))
    return n_done


# ---------------------------------------------------------------------------
# CLAP
# ---------------------------------------------------------------------------


def run_clap(ns) -> int:
    from llark_tpu.audio.io import read_wav
    from llark_tpu.encoders.clap.encode import (
        ClapEncoder,
        prepare_clip,
        quantize_roundtrip,
    )

    mesh = None
    if ns.data_parallel:
        import jax

        from llark_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((len(jax.devices()), 1, 1))
        log.info("data-parallel encode over %d devices", len(jax.devices()))
    if ns.checkpoint:
        from llark_tpu.encoders.clap.import_hf import load_clap_encoder

        cfg, params = load_clap_encoder(ns.checkpoint)
        enc = ClapEncoder(cfg, params, mesh=mesh)
    elif ns.tiny:
        from llark_tpu.encoders.clap.htsat import HTSATConfig

        enc = ClapEncoder.random_init(HTSATConfig.tiny(), mesh=mesh)
    else:
        log.warning("no --checkpoint given: RANDOM weights (throughput/dev only)")
        enc = ClapEncoder.random_init(mesh=mesh)
    os.makedirs(ns.output_dir, exist_ok=True)
    files = list_shard(ns.input_dir, ns.num_shards, ns.shard_index,
                       ns.skip_existing, ns.output_dir)
    log.info("shard %d/%d: %d files", ns.shard_index, ns.num_shards, len(files))
    t0 = time.time()
    n_done = 0
    # one RandomState across the run: per-file fresh seeds would make
    # rand_trunc deterministic-first-window; quantize_roundtrip is part of
    # the reference parity contract (clap_embeddings.py:127-153)
    trunc_rng = np.random.RandomState(0)
    for group in _batched(files, ns.batch_size):
        clips = []
        for name in group:
            samples, _ = read_wav(os.path.join(ns.input_dir, name), 48000)
            clips.append(prepare_clip(quantize_roundtrip(samples), rng=trunc_rng))
        emb = enc.embed_batch(np.stack(clips))
        for i, name in enumerate(group):
            _save_npy(storage.join(ns.output_dir, _npy_name(name)),
                    emb[i : i + 1].astype(np.float32))
            n_done += 1
    dt = time.time() - t0
    log.info("wrote %d embeddings in %.1fs (%.2f clips/s)", n_done, dt,
             n_done / max(dt, 1e-9))
    return n_done


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("llark_tpu.encoders.extract_cli")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("jukebox", run_jukebox), ("clap", run_clap)):
        c = sub.add_parser(name)
        c.add_argument("--input-dir", required=True)
        c.add_argument("--output-dir", required=True)
        c.add_argument("--checkpoint", default=None)
        c.add_argument("--batch-size", type=int, default=2 if name == "jukebox" else 16)
        c.add_argument("--num-shards", type=int, default=1)
        c.add_argument("--shard-index", type=int, default=0)
        c.add_argument("--skip-existing", action="store_true")
        c.add_argument("--tiny", action="store_true", help="tiny configs (tests)")
        c.add_argument("--data-parallel", action="store_true",
                       help="shard the clip batch over all local devices")
        if name == "jukebox":
            c.add_argument("--prior-checkpoint", default=None)
            c.add_argument("--prior-depth", type=int, default=36)
            c.add_argument("--fps", type=float, default=10.0)
            c.add_argument("--transfer-dtype", default="int16")
            c.add_argument("--output-dtype", default="bfloat16")
        c.set_defaults(fn=fn)
    ns = p.parse_args(argv)
    n = ns.fn(ns)
    return 0 if n >= 0 else 1


if __name__ == "__main__":
    sys.exit(main())
