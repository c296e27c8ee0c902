"""CLAP text tower: RoBERTa-style encoder + 2-layer projection in JAX.

The reference's evaluation notebooks embed model completions and label
sets with the OpenAI text-embeddings API (notebooks/eval_genre_gtzan.ipynb)
— unusable offline. HF ships CLAP's text tower (RoBERTa-base + MLP
projection, `ClapTextModelWithProjection` in laion/clap-htsat-unfused),
trained contrastively against the HTSAT audio tower we already import
(import_hf.py): its embeddings are music-domain and run on-device, so
`evaluation/harness.py --embedder clap` scores genre acc@k with REAL
embeddings instead of the hashed bag-of-words fallback.

Architecture (post-LN BERT encoder, RoBERTa position indexing):
  x = LN(word[ids] + pos[pos_ids] + type[0])
  per layer: x = LN(x + W_o·attn(x));  x = LN(x + W2·gelu(W1·x))
  pooled = tanh(W_p · x[:, 0]);  embed = W_b·act(W_a·pooled)
Position ids follow RoBERTa's create_position_ids_from_input_ids:
cumsum(mask)·mask + pad_id, so padding rows stay at the pad position.

Import parity vs torch `ClapTextModelWithProjection` is tested to the
same 2e-4 tolerance as the audio tower (tests/test_clap_text.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass
class ClapTextConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12
    projection_dim: int = 512
    projection_act: str = "relu"  # ClapProjectionLayer's activation

    @classmethod
    def base(cls, **kw) -> "ClapTextConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "ClapTextConfig":
        base = dict(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                    intermediate_size=128, max_position_embeddings=64,
                    projection_dim=32)
        base.update(kw)
        return cls(**base)


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def roberta_position_ids(ids: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """RoBERTa position indexing: non-pad tokens count 1.. from the left,
    offset by pad_id+... (create_position_ids_from_input_ids)."""
    mask = (ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


def clap_text_embed(
    cfg: ClapTextConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, S] int32
    attention_mask: Optional[jnp.ndarray] = None,  # [B, S] 1=real
) -> jnp.ndarray:
    """input ids -> L2-unnormalized text embeddings [B, projection_dim]."""
    ids = input_ids.astype(jnp.int32)
    if attention_mask is None:
        attention_mask = (ids != cfg.pad_token_id).astype(jnp.float32)
    pos = roberta_position_ids(ids, cfg.pad_token_id)
    emb = params["embeddings"]
    x = (jnp.take(emb["word"], ids, axis=0)
         + jnp.take(emb["position"], pos, axis=0)
         + emb["token_type"][0])
    x = _ln(x, emb["ln_g"], emb["ln_b"], cfg.layer_norm_eps)

    b, s, h = x.shape
    nh, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    # additive key mask (HF extends with dtype-min on padded keys)
    bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9

    for lp in params["layers"]:
        qkv = x @ lp["qkv_w"] + lp["qkv_b"]  # [B, S, 3H]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh) + bias
        att = jax.nn.softmax(att, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, h)
        a = a @ lp["proj_w"] + lp["proj_b"]
        x = _ln(x + a, lp["n1_g"], lp["n1_b"], cfg.layer_norm_eps)
        ff = jax.nn.gelu(x @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        ff = ff @ lp["fc2_w"] + lp["fc2_b"]
        x = _ln(x + ff, lp["n2_g"], lp["n2_b"], cfg.layer_norm_eps)

    pooled = jnp.tanh(x[:, 0] @ params["pooler"]["w"] + params["pooler"]["b"])
    pr = params["proj"]
    z = pooled @ pr["w1"] + pr["b1"]
    z = jax.nn.relu(z) if cfg.projection_act == "relu" else jax.nn.gelu(
        z, approximate=False
    )
    return z @ pr["w2"] + pr["b2"]


def init_text_params(cfg: ClapTextConfig, key: jax.Array) -> Params:
    """Random init (tests / from-scratch probes)."""
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))

    def w_(shape, fan_in=None):
        fan = fan_in or shape[0]
        return (jax.random.normal(next(keys), shape, jnp.float32)
                / np.sqrt(fan)).astype(np.float32)

    h, i = cfg.hidden_size, cfg.intermediate_size
    params: Params = {
        "embeddings": {
            "word": w_((cfg.vocab_size, h), h),
            "position": w_((cfg.max_position_embeddings, h), h),
            "token_type": w_((cfg.type_vocab_size, h), h),
            "ln_g": np.ones((h,), np.float32),
            "ln_b": np.zeros((h,), np.float32),
        },
        "layers": [],
        "pooler": {"w": w_((h, h)), "b": np.zeros((h,), np.float32)},
        "proj": {
            "w1": w_((h, cfg.projection_dim)),
            "b1": np.zeros((cfg.projection_dim,), np.float32),
            "w2": w_((cfg.projection_dim, cfg.projection_dim)),
            "b2": np.zeros((cfg.projection_dim,), np.float32),
        },
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "qkv_w": w_((h, 3 * h), h),
            "qkv_b": np.zeros((3 * h,), np.float32),
            "proj_w": w_((h, h)),
            "proj_b": np.zeros((h,), np.float32),
            "n1_g": np.ones((h,), np.float32),
            "n1_b": np.zeros((h,), np.float32),
            "fc1_w": w_((h, i), h),
            "fc1_b": np.zeros((i,), np.float32),
            "fc2_w": w_((i, h), i),
            "fc2_b": np.zeros((h,), np.float32),
            "n2_g": np.ones((h,), np.float32),
            "n2_b": np.zeros((h,), np.float32),
        })
    return params


# ---------------------------------------------------------------------------
# HF import (mirrors import_hf.py's audio-tower pattern)
# ---------------------------------------------------------------------------


def text_config_from_hf(text_cfg, projection_dim: int = 512) -> ClapTextConfig:
    """transformers ClapTextConfig -> ClapTextConfig."""
    return ClapTextConfig(
        vocab_size=text_cfg.vocab_size,
        hidden_size=text_cfg.hidden_size,
        num_layers=text_cfg.num_hidden_layers,
        num_heads=text_cfg.num_attention_heads,
        intermediate_size=text_cfg.intermediate_size,
        max_position_embeddings=text_cfg.max_position_embeddings,
        type_vocab_size=text_cfg.type_vocab_size,
        pad_token_id=text_cfg.pad_token_id,
        layer_norm_eps=text_cfg.layer_norm_eps,
        projection_dim=getattr(text_cfg, "projection_dim", projection_dim),
        projection_act=getattr(text_cfg, "projection_hidden_act", "relu"),
    )


def text_params_from_hf(sd: Dict[str, np.ndarray], cfg: ClapTextConfig) -> Params:
    """HF ClapTextModelWithProjection state dict (numpy) -> text params."""

    def g(key):
        return np.asarray(sd[key], np.float32)

    tm = "text_model"
    params: Params = {
        "embeddings": {
            "word": g(f"{tm}.embeddings.word_embeddings.weight"),
            "position": g(f"{tm}.embeddings.position_embeddings.weight"),
            "token_type": g(f"{tm}.embeddings.token_type_embeddings.weight"),
            "ln_g": g(f"{tm}.embeddings.LayerNorm.weight"),
            "ln_b": g(f"{tm}.embeddings.LayerNorm.bias"),
        },
        "layers": [],
        "pooler": {
            "w": np.ascontiguousarray(g(f"{tm}.pooler.dense.weight").T),
            "b": g(f"{tm}.pooler.dense.bias"),
        },
        "proj": {
            "w1": np.ascontiguousarray(g("text_projection.linear1.weight").T),
            "b1": g("text_projection.linear1.bias"),
            "w2": np.ascontiguousarray(g("text_projection.linear2.weight").T),
            "b2": g("text_projection.linear2.bias"),
        },
    }
    for li in range(cfg.num_layers):
        pre = f"{tm}.encoder.layer.{li}"
        qw = g(f"{pre}.attention.self.query.weight")  # [out, in]
        kw = g(f"{pre}.attention.self.key.weight")
        vw = g(f"{pre}.attention.self.value.weight")
        params["layers"].append({
            "qkv_w": np.ascontiguousarray(np.concatenate([qw.T, kw.T, vw.T], axis=1)),
            "qkv_b": np.concatenate([
                g(f"{pre}.attention.self.query.bias"),
                g(f"{pre}.attention.self.key.bias"),
                g(f"{pre}.attention.self.value.bias"),
            ]),
            "proj_w": np.ascontiguousarray(g(f"{pre}.attention.output.dense.weight").T),
            "proj_b": g(f"{pre}.attention.output.dense.bias"),
            "n1_g": g(f"{pre}.attention.output.LayerNorm.weight"),
            "n1_b": g(f"{pre}.attention.output.LayerNorm.bias"),
            "fc1_w": np.ascontiguousarray(g(f"{pre}.intermediate.dense.weight").T),
            "fc1_b": g(f"{pre}.intermediate.dense.bias"),
            "fc2_w": np.ascontiguousarray(g(f"{pre}.output.dense.weight").T),
            "fc2_b": g(f"{pre}.output.dense.bias"),
            "n2_g": g(f"{pre}.output.LayerNorm.weight"),
            "n2_b": g(f"{pre}.output.LayerNorm.bias"),
        })
    return params


def load_clap_text_encoder(path: str) -> Tuple[ClapTextConfig, Params]:
    """HF CLAP checkpoint dir/file -> (ClapTextConfig, params). Accepts
    ClapTextModelWithProjection exports and full ClapModel checkpoints."""
    import json
    import os

    from llark_tpu.interop.hf import load_hf_state_dict

    sd = load_hf_state_dict(path)
    if not any(k.startswith("text_model.") for k in sd):
        sd = {
            k.split(".", 1)[1]: v
            for k, v in sd.items()
            if k.startswith(("clap.text", "model.text"))
        } or sd
    cfg_path = os.path.join(path, "config.json") if os.path.isdir(path) else None
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        text_raw = raw.get("text_config", raw)
        from transformers import ClapTextConfig as HFTextConfig

        cfg = text_config_from_hf(
            HFTextConfig(**text_raw),
            projection_dim=raw.get("projection_dim", 512),
        )
    else:
        cfg = ClapTextConfig.base()
    return cfg, text_params_from_hf(sd, cfg)


def make_text_embedder(path: str, batch_size: int = 32, max_len: int = 77):
    """texts -> L2-normalized [N, D] embeddings — the drop-in embedder for
    evaluation/harness.py --embedder clap. Tokenizes with the checkpoint's
    own tokenizer (AutoTokenizer on the same dir); falls back to a
    deterministic hashed word tokenizer when no tokenizer files ship with
    the checkpoint (keeps the harness runnable, clearly lower quality)."""
    cfg, params = load_clap_text_encoder(path)
    # RoBERTa position ids run up to seq_len + pad_id: cap the window so
    # they stay inside the position table
    max_len = min(max_len, cfg.max_position_embeddings - cfg.pad_token_id - 1)
    params = jax.tree.map(jnp.asarray, params)
    embed_fn = jax.jit(lambda ids: clap_text_embed(cfg, params, ids))

    tok = None
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
    except Exception:  # noqa: BLE001 — tokenizer-less checkpoints fall back
        pass

    def tokenize(texts):
        if tok is not None:
            out = tok(list(texts), padding="max_length", truncation=True,
                      max_length=max_len)
            return np.asarray(out["input_ids"], np.int32)
        import zlib  # crc32: deterministic across processes (hash() is salted)

        ids = np.full((len(texts), max_len), cfg.pad_token_id, np.int32)
        for r, t in enumerate(texts):
            words = str(t).lower().split()[: max_len - 2]
            ids[r, 0] = 0  # <s>
            for c, w in enumerate(words):
                ids[r, c + 1] = 2 + (zlib.crc32(w.encode()) % (cfg.vocab_size - 2))
            ids[r, len(words) + 1] = 2  # </s>
        return ids

    def embedder(texts):
        texts = list(texts)
        out = []
        for i in range(0, len(texts), batch_size):
            ids = tokenize(texts[i : i + batch_size])
            out.append(np.asarray(embed_fn(jnp.asarray(ids))))
        vecs = np.concatenate(out, axis=0)
        return vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-9)

    return embedder
