"""Import HF CLAP audio-tower weights into the JAX HTSAT encoder.

The reference loads laion_clap's HTSAT-base music checkpoint
(scripts/clap/clap_embeddings.py:63-81); HF transformers ships the same
weights as `ClapAudioModelWithProjection` (laion/clap-htsat-unfused).
This maps that state dict — patch embed, Swin stages with fused-on-import
q/k/v, relative-position-bias tables, patch merging, final norm, the mel
BatchNorm (folded to an eval-mode affine), and the 2-layer projection —
onto llark_tpu.encoders.clap.htsat params. Logit parity vs torch is
tested in tests/test_clap_import.py.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from llark_tpu.encoders.clap.htsat import HTSATConfig

Params = Dict[str, Any]


def config_from_hf(audio_cfg) -> HTSATConfig:
    """Build HTSATConfig from a transformers ClapAudioConfig."""
    return HTSATConfig(
        spec_size=audio_cfg.spec_size,
        freq_ratio=audio_cfg.spec_size // audio_cfg.num_mel_bins,
        patch_size=audio_cfg.patch_size,
        embed_dim=audio_cfg.patch_embeds_hidden_size,
        depths=tuple(audio_cfg.depths),
        num_heads=tuple(audio_cfg.num_attention_heads),
        window_size=audio_cfg.window_size,
        mlp_ratio=float(audio_cfg.mlp_ratio),
        out_dim=audio_cfg.projection_dim,
        n_mels=audio_cfg.num_mel_bins,
        n_frames=audio_cfg.spec_size * (audio_cfg.spec_size // audio_cfg.num_mel_bins),
    )


def clap_params_from_hf(sd: Dict[str, np.ndarray], cfg: HTSATConfig) -> Params:
    """HF ClapAudioModelWithProjection state dict (numpy) -> htsat params."""

    def g(key):
        return np.asarray(sd[key], np.float32)

    enc = "audio_model.audio_encoder"
    params: Params = {
        "mel_bn": {
            "g": g(f"{enc}.batch_norm.weight"),
            "b": g(f"{enc}.batch_norm.bias"),
            "mean": g(f"{enc}.batch_norm.running_mean"),
            "var": g(f"{enc}.batch_norm.running_var"),
        },
        "patch_embed": {
            "w": g(f"{enc}.patch_embed.proj.weight"),  # [C, 1, p, p] OIHW
            "b": g(f"{enc}.patch_embed.proj.bias"),
            "norm_g": g(f"{enc}.patch_embed.norm.weight"),
            "norm_b": g(f"{enc}.patch_embed.norm.bias"),
        },
        "stages": [],
    }
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            pre = f"{enc}.layers.{si}.blocks.{bi}"
            qw = g(f"{pre}.attention.self.query.weight")  # [D, D] (out, in)
            kw = g(f"{pre}.attention.self.key.weight")
            vw = g(f"{pre}.attention.self.value.weight")
            blocks.append(
                {
                    "n1_g": g(f"{pre}.layernorm_before.weight"),
                    "n1_b": g(f"{pre}.layernorm_before.bias"),
                    "qkv_w": np.ascontiguousarray(
                        np.concatenate([qw.T, kw.T, vw.T], axis=1)
                    ),
                    "qkv_b": np.concatenate(
                        [
                            g(f"{pre}.attention.self.query.bias"),
                            g(f"{pre}.attention.self.key.bias"),
                            g(f"{pre}.attention.self.value.bias"),
                        ]
                    ),
                    "rel_bias": g(f"{pre}.attention.self.relative_position_bias_table"),
                    "proj_w": np.ascontiguousarray(
                        g(f"{pre}.attention.output.dense.weight").T
                    ),
                    "proj_b": g(f"{pre}.attention.output.dense.bias"),
                    "n2_g": g(f"{pre}.layernorm_after.weight"),
                    "n2_b": g(f"{pre}.layernorm_after.bias"),
                    "fc1_w": np.ascontiguousarray(g(f"{pre}.intermediate.dense.weight").T),
                    "fc1_b": g(f"{pre}.intermediate.dense.bias"),
                    "fc2_w": np.ascontiguousarray(g(f"{pre}.output.dense.weight").T),
                    "fc2_b": g(f"{pre}.output.dense.bias"),
                }
            )
        stage: Params = {"blocks": blocks, "downsample": None}
        ds = f"{enc}.layers.{si}.downsample"
        if f"{ds}.reduction.weight" in sd:
            stage["downsample"] = {
                "norm_g": g(f"{ds}.norm.weight"),
                "norm_b": g(f"{ds}.norm.bias"),
                "red_w": np.ascontiguousarray(g(f"{ds}.reduction.weight").T),
            }
        params["stages"].append(stage)
    params["final_norm"] = {"g": g(f"{enc}.norm.weight"), "b": g(f"{enc}.norm.bias")}
    params["proj"] = {
        "w1": np.ascontiguousarray(g("audio_projection.linear1.weight").T),
        "b1": g("audio_projection.linear1.bias"),
        "w2": np.ascontiguousarray(g("audio_projection.linear2.weight").T),
        "b2": g("audio_projection.linear2.bias"),
    }
    return params


def load_clap_encoder(path: str):
    """Load an HF CLAP checkpoint dir/file -> (HTSATConfig, params).
    Works with ClapAudioModelWithProjection exports and full ClapModel
    checkpoints (audio tower keys are prefixed identically)."""
    from llark_tpu.interop.hf import load_hf_state_dict

    sd = load_hf_state_dict(path)
    # full ClapModel checkpoints scope the audio tower under "clap." or not;
    # normalize to the audio_model./audio_projection. prefix space
    if not any(k.startswith("audio_model.") for k in sd):
        sd = {
            k.split(".", 1)[1]: v
            for k, v in sd.items()
            if k.startswith(("clap.audio", "model.audio"))
        } or sd
    import json
    import os

    cfg_path = os.path.join(path, "config.json") if os.path.isdir(path) else None
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        audio_raw = raw.get("audio_config", raw)
        from transformers import ClapAudioConfig

        cfg = config_from_hf(ClapAudioConfig(**audio_raw))
    else:
        cfg = HTSATConfig.base()
    return cfg, clap_params_from_hf(sd, cfg)
