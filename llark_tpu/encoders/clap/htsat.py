"""HTSAT audio transformer (Swin-style) for the CLAP embedding variant.

TPU-native reimplementation of the encoder the reference invokes through
laion_clap (reference: scripts/clap/clap_embeddings.py:63-107 —
CLAP_Module(enable_fusion=False, amodel='HTSAT-base'),
get_audio_embedding -> 512-d vectors).

Shape pipeline (HTS-AT, Chen et al. 2022 + laion_clap conventions):
  log-mel [B, T=1024, F=64]
    -> wav2img reshape: time split into freq_ratio=4 chunks stacked along
       frequency -> [B, 1, 256, 256]
    -> 4x4 patch embed (C=embed_dim) -> tokens on a 64x64 grid
    -> 4 Swin stages (depths/heads per config), window attention with
       relative position bias, shifted windows on odd blocks, patch
       merging between stages
    -> final norm, mean pool -> [B, 8*embed_dim]
    -> audio projection MLP -> [B, 512]

Head caveat: laion_clap's HTSAT also carries a token-semantic CNN head
(framewise logits); the CLAP embedding path pools the transformer output
and projects it — that path is what's implemented. The torch importer
validates tensor-by-tensor shape agreement, so any head-detail mismatch
fails at import rather than silently.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass
class HTSATConfig:
    spec_size: int = 256
    freq_ratio: int = 4
    patch_size: int = 4
    embed_dim: int = 128  # HTSAT-base; tiny=96
    depths: Tuple[int, ...] = (2, 2, 12, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    out_dim: int = 512  # CLAP joint space
    n_mels: int = 64
    n_frames: int = 1024
    eps: float = 1e-5
    dtype: str = "float32"

    @classmethod
    def base(cls) -> "HTSATConfig":
        return cls()

    @classmethod
    def tiny(cls, **kw) -> "HTSATConfig":
        base = dict(
            spec_size=64, freq_ratio=4, embed_dim=16, depths=(1, 1),
            num_heads=(2, 4), window_size=4, n_mels=16, n_frames=256,
        )
        base.update(kw)
        return cls(**base)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def dense(x, w, b=None):
    y = jnp.einsum("...i,ij->...j", x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return y if b is None else y + b


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]"""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(x: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def relative_position_index(w: int) -> np.ndarray:
    """Standard Swin relative position index [w*w, w*w]."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))  # [2,w,w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, ww, ww]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(h: int, ww: int, w: int, shift: int) -> np.ndarray:
    """Attention mask [nW, w*w, w*w] (True = allowed) for shifted windows.
    Pure numpy (computed at trace time — static)."""
    img = np.zeros((h, ww), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // w, w, ww // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    return win[:, :, None] == win[:, None, :]


def window_attention(
    x: jnp.ndarray,  # [nWb, w*w, C]
    p: Params,
    heads: int,
    w: int,
    mask: Optional[np.ndarray],  # [nW, w*w, w*w] or None
) -> jnp.ndarray:
    nwb, n, c = x.shape
    qkv = dense(x, p["qkv_w"], p["qkv_b"]).reshape(nwb, n, 3, heads, c // heads)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [nWb,H,n,hd]
    scale = 1.0 / math.sqrt(c // heads)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    rel_idx = relative_position_index(w).reshape(-1)
    bias = jnp.take(p["rel_bias"], rel_idx, axis=0).reshape(n, n, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(nwb // nw, nw, heads, n, n)
        attn = jnp.where(jnp.asarray(mask)[None, :, None], attn, -1e9)
        attn = attn.reshape(nwb, heads, n, n)
    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return dense(out, p["proj_w"], p["proj_b"])


def swin_block(
    x: jnp.ndarray,  # [B, H*W, C]
    p: Params,
    res: Tuple[int, int],
    heads: int,
    window: int,
    shift: int,
    mlp_ratio: float,
    eps: float,
) -> jnp.ndarray:
    h, ww = res
    b, l, c = x.shape
    shortcut = x
    y = layer_norm(x, p["n1_g"], p["n1_b"], eps).reshape(b, h, ww, c)
    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = shifted_window_mask(h, ww, window, shift)
    else:
        mask = None
    wins = window_partition(y, window)
    wins = window_attention(wins, p, heads, window, mask)
    y = window_reverse(wins, window, h, ww)
    if shift > 0:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = shortcut + y.reshape(b, l, c)
    z = layer_norm(x, p["n2_g"], p["n2_b"], eps)
    z = dense(z, p["fc1_w"], p["fc1_b"])
    z = jax.nn.gelu(z.astype(jnp.float32)).astype(x.dtype)
    z = dense(z, p["fc2_w"], p["fc2_b"])
    return x + z


def patch_merge(x: jnp.ndarray, p: Params, res: Tuple[int, int], eps: float) -> jnp.ndarray:
    h, ww = res
    b, l, c = x.shape
    y = x.reshape(b, h, ww, c)
    parts = [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2], y[:, 1::2, 1::2]]
    y = jnp.concatenate(parts, axis=-1).reshape(b, (h // 2) * (ww // 2), 4 * c)
    y = layer_norm(y, p["norm_g"], p["norm_b"], eps)
    return dense(y, p["red_w"])


# ---------------------------------------------------------------------------
# init + forward
# ---------------------------------------------------------------------------


def init_htsat_params(cfg: HTSATConfig, key: jax.Array) -> Params:
    counter = [0]

    def nxt():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def w_(shape, fan_in=None):
        fan_in = fan_in or shape[0]
        return jax.random.normal(nxt(), shape, jnp.float32) / math.sqrt(fan_in)

    c = cfg.embed_dim
    params: Params = {
        "patch_embed": {
            "w": w_((c, 1, cfg.patch_size, cfg.patch_size), cfg.patch_size**2),
            "b": jnp.zeros((c,)),
            "norm_g": jnp.ones((c,)),
            "norm_b": jnp.zeros((c,)),
        },
        "stages": [],
    }
    dim = c
    for si, depth in enumerate(cfg.depths):
        heads = cfg.num_heads[si]
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "n1_g": jnp.ones((dim,)), "n1_b": jnp.zeros((dim,)),
                    "qkv_w": w_((dim, 3 * dim)), "qkv_b": jnp.zeros((3 * dim,)),
                    "proj_w": w_((dim, dim)), "proj_b": jnp.zeros((dim,)),
                    "rel_bias": jnp.zeros(((2 * cfg.window_size - 1) ** 2, heads)),
                    "n2_g": jnp.ones((dim,)), "n2_b": jnp.zeros((dim,)),
                    "fc1_w": w_((dim, int(dim * cfg.mlp_ratio))),
                    "fc1_b": jnp.zeros((int(dim * cfg.mlp_ratio),)),
                    "fc2_w": w_((int(dim * cfg.mlp_ratio), dim)),
                    "fc2_b": jnp.zeros((dim,)),
                }
            )
        stage = {"blocks": blocks, "downsample": None}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm_g": jnp.ones((4 * dim,)),
                "norm_b": jnp.zeros((4 * dim,)),
                "red_w": w_((4 * dim, 2 * dim)),
            }
            dim *= 2
        params["stages"].append(stage)
    params["final_norm"] = {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    params["proj"] = {
        "w1": w_((dim, cfg.out_dim)), "b1": jnp.zeros((cfg.out_dim,)),
        "w2": w_((cfg.out_dim, cfg.out_dim)), "b2": jnp.zeros((cfg.out_dim,)),
    }
    return params


def wav2img(mel: jnp.ndarray, cfg: HTSATConfig) -> jnp.ndarray:
    """[B, T, F] -> [B, 1, spec, spec]: time split into freq_ratio chunks
    stacked along frequency (laion_clap htsat reshape_wav2img)."""
    b, t, f = mel.shape
    r = cfg.freq_ratio
    assert f * r == cfg.spec_size, f"mel bins {f} * freq_ratio {r} != spec {cfg.spec_size}"
    t_target = cfg.spec_size * r
    if t < t_target:
        mel = jnp.pad(mel, ((0, 0), (0, t_target - t), (0, 0)))
    mel = mel[:, :t_target]
    x = mel.transpose(0, 2, 1)  # [B, F, T]
    x = x.reshape(b, f, r, t_target // r)  # [B, F, r, T/r]
    x = x.transpose(0, 2, 1, 3)  # [B, r, F, T/r]
    x = x.reshape(b, r * f, t_target // r)  # [B, r*F=spec, T/r=spec]
    return x[:, None]  # [B, 1, spec, spec]


def htsat_embed(cfg: HTSATConfig, params: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """log-mel [B, T, F] -> CLAP audio embedding [B, out_dim]."""
    bn = params.get("mel_bn")
    if bn is not None:
        # per-mel-bin BatchNorm in eval mode = affine with running stats
        # (HF ClapAudioEncoder.batch_norm)
        inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-5)
        mel = ((mel.astype(jnp.float32) - bn["mean"]) * inv * bn["g"] + bn["b"]).astype(
            mel.dtype
        )
    x = wav2img(mel, cfg)  # [B,1,S,S]
    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        x, pe["w"], (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + pe["b"][None, :, None, None]
    b, c, h, ww = x.shape
    x = x.transpose(0, 2, 3, 1).reshape(b, h * ww, c)
    x = layer_norm(x, pe["norm_g"], pe["norm_b"], cfg.eps)

    res = (h, ww)
    for si, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[si]
        window = min(cfg.window_size, res[0])
        for bi, bp in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else window // 2
            if window >= res[0]:
                shift = 0
            x = swin_block(x, bp, res, heads, window, shift, cfg.mlp_ratio, cfg.eps)
        if stage["downsample"] is not None:
            x = patch_merge(x, stage["downsample"], res, cfg.eps)
            res = (res[0] // 2, res[1] // 2)

    x = layer_norm(x, params["final_norm"]["g"], params["final_norm"]["b"], cfg.eps)
    pooled = x.mean(axis=1)  # [B, C_final]
    p = params["proj"]
    y = dense(pooled, p["w1"], p["b1"])
    y = jax.nn.relu(y)
    return dense(y, p["w2"], p["b2"])
