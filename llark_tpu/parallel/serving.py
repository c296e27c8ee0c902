"""Mesh-sharded serving: tensor-parallel prefill + decode.

The reference serves one replica per GPU (SURVEY.md §2.8 — no TP). Here
generation can run sharded over a ("data", "fsdp", "tensor") mesh:

  * weights: Megatron-style column/row parallel over "tensor" and
    ZeRO-style over "fsdp" (same specs as training —
    llark_tpu/parallel/mesh.py); XLA inserts the all-reduces after wo /
    w_down and the lm_head all-gather from the shardings alone;
  * KV cache [L, B, H_kv, S, D]: batch over ("data","fsdp"), heads over
    "tensor" — each chip holds only its heads' cache, so cache capacity
    scales with the mesh;
  * batch: rows over ("data","fsdp").

`ShardedGenerator` has the same generate() surface as
llark_tpu.generate.Generator; tests validate logit/token equality vs the
single-chip path on an 8-virtual-device CPU mesh.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llark_tpu.config import ModelConfig
from llark_tpu.generate import (
    GenerationConfig,
    _sample,
    make_multistep_decode_fn,
    make_prefill_fn,
)
from llark_tpu.parallel.mesh import AXES, param_partition_specs, param_shardings


def kv_cache_spec(cfg: Optional[ModelConfig] = None) -> dict:
    """PartitionSpecs for the [L, B, H_kv, S, D] cache pytree (plus the
    [L, B, H_kv, S] scale leaves when cfg.kv_cache_quant)."""
    kv = P(None, AXES.batch, AXES.tensor, None, None)
    spec = {"k": kv, "v": kv, "index": P()}
    if cfg is not None and cfg.kv_cache_quant:
        sc = P(None, AXES.batch, AXES.tensor, None)
        spec.update({"k_scale": sc, "v_scale": sc})
    return spec


class ShardedGenerator:
    """Tensor/data-parallel Generator over a jax mesh."""

    def __init__(
        self,
        mesh: Mesh,
        cfg: ModelConfig,
        params,
        audio_patch_id: int,
        gen_cfg: Optional[GenerationConfig] = None,
        max_cache_len: int = 2048,
    ):
        self.mesh = mesh
        self.cfg = cfg
        self.gen_cfg = gen_cfg or GenerationConfig()
        self.audio_patch_id = audio_patch_id
        self.max_cache_len = max_cache_len

        # adapt to quantized param trees: int8 {q, scale} / int4 {q4c, ...}
        # leaves get matching spec dicts (production TP serving config is
        # int8 weights sharded over "tensor")
        from llark_tpu.parallel.mesh import adapt_specs_to_params

        pspecs = adapt_specs_to_params(param_partition_specs(cfg), params)
        self.param_sh = param_shardings(mesh, pspecs)
        self.params = jax.tree.map(jax.device_put, params, self.param_sh)

        cache_sh = jax.tree.map(
            lambda s: NamedSharding(mesh, s), kv_cache_spec(cfg),
            is_leaf=lambda x: isinstance(x, P),
        )
        batch_sh = NamedSharding(mesh, P(AXES.batch))
        row2_sh = NamedSharding(mesh, P(AXES.batch, None))
        row3_sh = NamedSharding(mesh, P(AXES.batch, None, None))
        rep = NamedSharding(mesh, P())

        self._prefill = jax.jit(
            make_prefill_fn(cfg, audio_patch_id, max_cache_len),
            in_shardings=(self.param_sh, row2_sh, batch_sh, row3_sh, batch_sh),
            out_shardings=(row2_sh, cache_sh),
        )
        self._decode_cache_sh = cache_sh
        self._batch_sh = batch_sh
        self._row2_sh = row2_sh
        self._rep = rep
        self._decode_n: dict = {}

    def _get_decode_n(self, n: int):
        if n not in self._decode_n:
            self._decode_n[n] = jax.jit(
                make_multistep_decode_fn(self.cfg, self.gen_cfg, n),
                in_shardings=(
                    self.param_sh,
                    self._batch_sh,
                    self._decode_cache_sh,
                    self._batch_sh,
                    self._rep,
                ),
                out_shardings=(self._row2_sh, self._row2_sh, self._decode_cache_sh),
                donate_argnums=(2,),
            )
        return self._decode_n[n]

    def generate(
        self,
        input_ids: np.ndarray,
        prompt_lengths: np.ndarray,
        audio_encodings: Optional[np.ndarray] = None,
        audio_frame_counts: Optional[np.ndarray] = None,
        tokenizer=None,
        rng: Optional[jax.Array] = None,
    ) -> List[List[int]]:
        gen_cfg = self.gen_cfg
        b, s = input_ids.shape
        if s + gen_cfg.max_new_tokens > self.max_cache_len:
            raise ValueError("prompt + max_new_tokens exceeds cache length")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if audio_encodings is None:
            audio_encodings = np.zeros((b, 1, self.cfg.mm_hidden_size), np.float32)
            audio_frame_counts = np.zeros((b,), np.int32)
        if audio_frame_counts is None:
            audio_frame_counts = np.full((b,), audio_encodings.shape[1], np.int32)

        prompt_lengths = jnp.asarray(prompt_lengths, jnp.int32)
        with self.mesh:
            logits, cache = self._prefill(
                self.params,
                jnp.asarray(input_ids),
                prompt_lengths,
                jnp.asarray(audio_encodings, jnp.float32),
                jnp.asarray(audio_frame_counts, jnp.int32),
            )

            done = np.zeros((b,), bool)
            out: List[List[int]] = [[] for _ in range(b)]
            eos = gen_cfg.eos_token_id
            stop_text = gen_cfg.stop_text

            def absorb(tok_col: np.ndarray) -> None:
                for i in range(b):
                    if not done[i]:
                        t = int(tok_col[i])
                        if eos is not None and t == eos:
                            done[i] = True
                            continue
                        out[i].append(t)
                        if stop_text and tokenizer is not None:
                            tail = tokenizer.decode(out[i][-8:])
                            if stop_text in tail:
                                done[i] = True

            token = _sample(logits, gen_cfg, rng)
            absorb(np.asarray(token))
            emitted = 1
            chunk = max(1, int(gen_cfg.decode_chunk))
            while emitted < gen_cfg.max_new_tokens and not done.all():
                n = min(chunk, gen_cfg.max_new_tokens - emitted)
                rng, sub = jax.random.split(rng)
                toks, _lg, cache = self._get_decode_n(n)(
                    self.params, token, cache, prompt_lengths + (emitted - 1), sub
                )
                tok_np = np.asarray(toks)
                for j in range(n):
                    absorb(tok_np[:, j])
                    if done.all():
                        break
                token = toks[:, -1]
                emitted += n

        if stop_text and tokenizer is not None:
            from llark_tpu.generate import Generator

            out = [Generator._trim_stop(ids, tokenizer, stop_text) for ids in out]
        return out
