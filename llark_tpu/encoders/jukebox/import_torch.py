"""Import openai/jukebox 5B checkpoint weights into our param layout.

Usage (offline, wherever the public checkpoints are on disk):

  python -m llark_tpu.encoders.jukebox.import_torch \
      --vqvae vqvae.pth.tar --prior prior_level_2.pth.tar \
      --depth 36 --output jukebox5b_36.npz \
      [--conds conds.npz]   # optional captured x_cond/y_cond arrays

The reference loads the full 72-layer prior with strict=False after
patching prior_depth=36 (reference: jukebox/make_models.py.patch,
jukebox/main.py:188-199) — i.e. layers >= 36 are simply dropped. This
importer does the same truncation explicitly.

Name mapping (openai/jukebox state dicts -> ours):
  VQ-VAE (encoders only):
    encoders.{l}.level_blocks.{l2}.model.{i}.*   downsample convs + resnets
    bottleneck.level_blocks.{l}.k                codebook [bins, emb]
  Prior (prior.* inside the checkpoint, 'module.' stripped):
    prior.x_emb.weight                 [bins, width]
    prior.pos_emb.pos_emb              [n_ctx, width]
    prior.transformer._attn_mods.{d}.{ln_0,attn.c_attn,attn.c_proj,
                                      ln_1,mlp.c_fc,mlp.c_proj}.*
  jukebox Conv1D stores w as [n_in, n_out] (x @ w), matching our layout.

Conditioning (x_cond/y_cond for the fixed dummy metadata the reference
uses, jukebox/main.py:71-98) is a per-checkpoint constant; pass --conds
with arrays captured once from the torch side, or omit for zeros.
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np

from llark_tpu.encoders.jukebox.config import JukeboxPriorConfig, JukeboxVQVAEConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def strip_module(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}


def convert_vqvae(sd: Dict[str, Any], cfg: JukeboxVQVAEConfig) -> Dict[str, Any]:
    """Map encoder + bottleneck tensors into our vqvae param tree."""
    sd = strip_module(sd)
    levels = []
    top = cfg.levels - 1
    for level in range(cfg.levels):
        # jukebox builds an INDEPENDENT full encoder per VQ level:
        # encoders.{l} chains level_blocks.{0..l} from raw audio (weights
        # are NOT shared across encoders). Our vqvae.encode_level chains
        # params levels[0..L], so for the top-level codes — the only level
        # the reference consumes (jukebox/main.py:54-68 get_z) — every
        # block must come from the TOP encoder's chain,
        # encoders.{top}.level_blocks.{0..top}. Taking the diagonal
        # encoders.{l}.level_blocks.{l} type-checks (all shapes agree) but
        # composes blocks no codebook was trained with.
        block_prefix = f"encoders.{top}.level_blocks.{level}"
        stages = []
        for stage_idx in range(cfg.downs_t[level]):
            base = f"{block_prefix}.model.{stage_idx}"
            stage = {
                "down_w": _np(sd[f"{base}.0.weight"]),
                "down_b": _np(sd[f"{base}.0.bias"]),
                "res": [],
            }
            # probe the res-block count from the checkpoint keys instead of
            # trusting cfg.depth: encoder depth is width-multiplier-scaled
            # per encoder in the openai hps, so a config/checkpoint mismatch
            # must fail loudly below, never silently truncate the resnet
            d = 0
            while f"{base}.1.model.{d}.model.1.weight" in sd:
                rbase = f"{base}.1.model.{d}.model"
                stage["res"].append(
                    {
                        "w1": _np(sd[f"{rbase}.1.weight"]),
                        "b1": _np(sd[f"{rbase}.1.bias"]),
                        "w2": _np(sd[f"{rbase}.3.weight"]),
                        "b2": _np(sd[f"{rbase}.3.bias"]),
                    }
                )
                d += 1
            if d != cfg.top_depth:
                raise ValueError(
                    f"{base}: checkpoint has {d} res blocks, config expects "
                    f"top_depth={cfg.top_depth} (depth {cfg.depth} x "
                    f"multiplier {cfg.multipliers[top]})"
                )
            stages.append(stage)
        proj_key = f"{block_prefix}.model.{cfg.downs_t[level]}"
        levels.append(
            {
                "stages": stages,
                "proj_w": _np(sd[f"{proj_key}.weight"]),
                "proj_b": _np(sd[f"{proj_key}.bias"]),
            }
        )
    codebooks = []
    for level in range(cfg.levels):
        k = _np(sd[f"bottleneck.level_blocks.{level}.k"])
        if k.shape[0] == cfg.emb_width:  # stored [emb, bins] -> [bins, emb]
            k = k.T
        codebooks.append(k)
    return {"levels": levels, "codebooks": codebooks}


def convert_prior(sd: Dict[str, Any], cfg: JukeboxPriorConfig) -> Dict[str, Any]:
    sd = strip_module(sd)
    # accept either 'prior.' or bare prefixes
    def get(name):
        for prefix in ("prior.", ""):
            key = prefix + name
            if key in sd:
                return _np(sd[key])
        raise KeyError(name)

    assert cfg.depth % 3 == 0
    cycles = cfg.depth // 3
    names = {
        "ln0_g": "ln_0.weight", "ln0_b": "ln_0.bias",
        "attn_w": "attn.c_attn.w", "attn_b": "attn.c_attn.b",
        "proj_w": "attn.c_proj.w", "proj_b": "attn.c_proj.b",
        "ln1_g": "ln_1.weight", "ln1_b": "ln_1.bias",
        "fc_w": "mlp.c_fc.w", "fc_b": "mlp.c_fc.b",
        "mlp_proj_w": "mlp.c_proj.w", "mlp_proj_b": "mlp.c_proj.b",
    }
    layers: Dict[str, list] = {k: [] for k in names}
    for cyc in range(cycles):
        row = {k: [] for k in names}
        for i in range(3):
            d = cyc * 3 + i
            for ours, theirs in names.items():
                row[ours].append(get(f"transformer._attn_mods.{d}.{theirs}"))
        for k in names:
            layers[k].append(np.stack(row[k]))
    stacked = {k: np.stack(v) for k, v in layers.items()}  # [cycles, 3, ...]
    return {
        "x_emb": get("x_emb.weight"),
        "pos_emb": get("pos_emb.pos_emb"),
        "layers": stacked,
    }


def infer_prior_config(
    sd: Dict[str, Any], depth: int = 36, heads: int = 8, blocks: int = 0
) -> JukeboxPriorConfig:
    """Sizes come from tensor shapes; `heads` and `blocks` are not
    recoverable from shapes and must match the training config (5b top
    prior: heads=8, blocks=128). blocks=0 -> n_ctx // 64 (block_ctx is 64
    in every public prior)."""
    sd = strip_module(sd)
    def shape(name):
        for prefix in ("prior.", ""):
            if prefix + name in sd:
                t = sd[prefix + name]
                return tuple(getattr(t, "shape", np.shape(t)))
        raise KeyError(name)

    bins, width = shape("x_emb.weight")
    n_ctx, _ = shape("pos_emb.pos_emb")
    _, attn3 = shape("transformer._attn_mods.0.attn.c_attn.w")
    _, mlp_w = shape("transformer._attn_mods.0.mlp.c_fc.w")
    return JukeboxPriorConfig(
        n_ctx=int(n_ctx),
        width=int(width),
        depth=depth,
        heads=heads,
        bins=int(bins),
        blocks=blocks or int(n_ctx) // 64,
        m_attn=(attn3 // 3) / width,
        m_mlp=mlp_w / width,
    )


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Invert the dotted-key flattening below; integer path components
    become list indices."""
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for i, part in enumerate(parts):
            last = i == len(parts) - 1
            node = node.setdefault(part, value if last else {})

    def materialize(node):
        if not isinstance(node, dict):
            return node
        if node and all(re.fullmatch(r"\d+", k) for k in node):
            return [materialize(node[str(i)]) for i in range(len(node))]
        return {k: materialize(v) for k, v in node.items()}

    return materialize(root)


def load_npz(path: str):
    """Read an importer-produced npz back into (vq_cfg, prior_cfg,
    vq_params, prior_params, cond_params|None, conds|None)."""
    import json

    z = np.load(path)
    vq_cfg = JukeboxVQVAEConfig(
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in json.loads(bytes(z["__vq_cfg__"]).decode()).items()}
    )
    pr_cfg = JukeboxPriorConfig(
        **json.loads(bytes(z["__prior_cfg__"]).decode())
    )
    groups: Dict[str, Dict[str, np.ndarray]] = {"vq": {}, "prior": {}, "cond": {}}
    conds = {}
    for key in z.files:
        if key.startswith("__"):
            continue
        head, _, rest = key.partition(".")
        if head in groups:
            groups[head][rest] = z[key]
        elif head in ("x_cond", "y_cond"):
            conds[head] = z[key]
    return (
        vq_cfg,
        pr_cfg,
        _unflatten(groups["vq"]),
        _unflatten(groups["prior"]),
        _unflatten(groups["cond"]) if groups["cond"] else None,
        conds or None,
    )


def main(argv=None):
    import torch

    p = argparse.ArgumentParser()
    p.add_argument("--vqvae", required=True)
    p.add_argument("--prior", required=True)
    p.add_argument("--depth", type=int, default=36)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--blocks", type=int, default=0, help="0 = n_ctx // 64")
    p.add_argument("--output", required=True)
    p.add_argument("--conds", default=None, help="npz with x_cond/y_cond")
    p.add_argument("--vq-width", type=int, default=32)
    p.add_argument("--vq-depth", type=int, default=4)
    p.add_argument("--vq-emb-width", type=int, default=64)
    p.add_argument("--vq-bins", type=int, default=2048)
    args = p.parse_args(argv)

    vq_sd = torch.load(args.vqvae, map_location="cpu")["model"]
    pr_sd = torch.load(args.prior, map_location="cpu")["model"]
    vq_cfg = JukeboxVQVAEConfig(
        width=args.vq_width, depth=args.vq_depth,
        emb_width=args.vq_emb_width, l_bins=args.vq_bins,
    )
    pr_cfg = infer_prior_config(pr_sd, args.depth, heads=args.heads,
                                blocks=args.blocks)
    vq_params = convert_vqvae(vq_sd, vq_cfg)
    pr_params = convert_prior(pr_sd, pr_cfg)

    # label-conditioner tables (x_cond/y_cond computation at load time;
    # reference: jukebox/main.py:71-98) — optional: absent in truncated
    # test fixtures, present in the public prior checkpoints
    cond_params = None
    try:
        from llark_tpu.encoders.jukebox.conditioner import convert_conditioner

        cond_params = convert_conditioner(strip_module(pr_sd))
    except KeyError:
        print("no y_emb.* conditioner tables in the prior checkpoint; "
              "x_cond/y_cond default to zeros unless --conds is given")

    flat: Dict[str, np.ndarray] = {}

    def put(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                put(f"{prefix}.{k}", v)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                put(f"{prefix}.{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    put("vq", vq_params)
    put("prior", pr_params)
    if cond_params is not None:
        put("cond", cond_params)
    if args.conds:
        conds = np.load(args.conds)
        flat["x_cond"] = conds["x_cond"]
        flat["y_cond"] = conds["y_cond"]
    import dataclasses, json

    flat["__vq_cfg__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(vq_cfg)).encode(), dtype=np.uint8
    )
    flat["__prior_cfg__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(pr_cfg)).encode(), dtype=np.uint8
    )
    np.savez(args.output, **flat)
    print(f"wrote {len(flat)} arrays to {args.output}")


if __name__ == "__main__":
    main()
