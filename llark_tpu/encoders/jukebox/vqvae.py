"""Jukebox VQ-VAE encode path (audio -> top-level discrete codes).

TPU-native reimplementation of the encode-only subset the reference uses
(reference: jukebox/main.py:54-68 `get_z` — vqvae.encode, top level codes).
Decode/training paths are out of scope (the reference never calls them).

Structure per level l (openai/jukebox encdec.py semantics):
  EncoderConvBlock: downs_t[l] stages of
      [Conv1d(stride 2, kernel 4, pad 1) -> Resnet1D(depth, dilation 3^d)]
  then Conv1d(width -> emb_width, kernel 3, pad 1).
  Level l consumes the raw audio through blocks 0..l cumulatively.
Bottleneck: nearest-neighbour codebook lookup (L2), codebook [bins, emb].

Conv1d here is jax.lax.conv_general_dilated over NCW layout; the
nearest-neighbour search is a single [T, emb] x [emb, bins] matmul +
argmin — MXU-friendly, no gather loops.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from llark_tpu.encoders.jukebox.config import JukeboxVQVAEConfig

Params = Dict[str, Any]


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int, padding: int,
           dilation: int = 1) -> jnp.ndarray:
    """x [N, C_in, T], w [C_out, C_in, K] (torch layout), b [C_out]."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


def res_conv_block(x: jnp.ndarray, p: Params, dilation: int) -> jnp.ndarray:
    """ReLU -> Conv(k3, dilated) -> ReLU -> Conv(k1) + residual."""
    h = jax.nn.relu(x)
    h = conv1d(h, p["w1"], p["b1"], stride=1, padding=dilation, dilation=dilation)
    h = jax.nn.relu(h)
    h = conv1d(h, p["w2"], p["b2"], stride=1, padding=0)
    return x + h


def resnet1d(x: jnp.ndarray, blocks: List[Params], growth: int) -> jnp.ndarray:
    for d, p in enumerate(blocks):
        x = res_conv_block(x, p, dilation=growth**d)
    return x


def encoder_conv_block(x: jnp.ndarray, p: Params, cfg: JukeboxVQVAEConfig, level: int) -> jnp.ndarray:
    stride = cfg.strides_t[level]
    filter_t, pad_t = stride * 2, stride // 2
    for stage in p["stages"]:
        x = conv1d(x, stage["down_w"], stage["down_b"], stride=stride, padding=pad_t)
        x = resnet1d(x, stage["res"], cfg.dilation_growth_rate)
    x = conv1d(x, p["proj_w"], p["proj_b"], stride=1, padding=1)
    return x


def init_vqvae_params(cfg: JukeboxVQVAEConfig, key: jax.Array) -> Params:
    """Random init (for tests; real weights come from import_torch)."""
    counter = [0]

    def w(shape):
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        fan_in = shape[1] * shape[2] if len(shape) == 3 else shape[0]
        return jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)

    # the params tree models the TOP encoder chain (the only encoder the
    # embedding path consumes), so width/depth take the top multiplier
    width, depth = cfg.top_width, cfg.top_depth
    levels = []
    for level in range(cfg.levels):
        in_ch = 1 if level == 0 else cfg.emb_width
        stages = []
        for stage_idx in range(cfg.downs_t[level]):
            c_in = in_ch if stage_idx == 0 else width
            stride = cfg.strides_t[level]
            stage = {
                "down_w": w((width, c_in, stride * 2)),
                "down_b": jnp.zeros((width,)),
                "res": [
                    {
                        "w1": w((int(cfg.m_conv * width), width, 3)),
                        "b1": jnp.zeros((int(cfg.m_conv * width),)),
                        "w2": w((width, int(cfg.m_conv * width), 1)),
                        "b2": jnp.zeros((width,)),
                    }
                    for _ in range(depth)
                ],
            }
            stages.append(stage)
        levels.append(
            {
                "stages": stages,
                "proj_w": w((cfg.emb_width, width, 3)),
                "proj_b": jnp.zeros((cfg.emb_width,)),
            }
        )
    codebooks = [
        jax.random.normal(
            jax.random.fold_in(key, 1000 + l), (cfg.l_bins, cfg.emb_width), jnp.float32
        )
        for l in range(cfg.levels)
    ]
    return {"levels": levels, "codebooks": codebooks}


def quantize(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """x [N, emb, T] -> nearest codebook indices [N, T].

    dist(t, j) = |x_t|^2 - 2 x_t.k_j + |k_j|^2; the x term is constant per
    t and dropped. One matmul + argmin, fp32 accumulation.
    """
    xt = x.transpose(0, 2, 1)  # [N, T, emb]
    scores = jnp.einsum(
        "nte,je->ntj", xt, codebook, preferred_element_type=jnp.float32
    )
    k_sq = 0.5 * jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)  # [bins]
    return jnp.argmin(k_sq[None, None, :] - scores, axis=-1).astype(jnp.int32)


def encode_level(
    cfg: JukeboxVQVAEConfig, params: Params, audio: jnp.ndarray, level: int
) -> jnp.ndarray:
    """audio [N, T_samples] (mono, peak-normalized) -> codes [N, T/hop]."""
    x = audio[:, None, :]  # NCW
    for l in range(level + 1):
        x = encoder_conv_block(x, params["levels"][l], cfg, l)
    return quantize(x, params["codebooks"][level])


def encode_top(cfg: JukeboxVQVAEConfig, params: Params, audio: jnp.ndarray) -> jnp.ndarray:
    """Top-level (128x hop) codes — the only level the reference consumes."""
    return encode_level(cfg, params, audio, cfg.levels - 1)
