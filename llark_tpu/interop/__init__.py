"""HF-checkpoint interop: import Llama-2 / MPT weights, export back."""

from llark_tpu.interop.hf import (  # noqa: F401
    hf_state_dict_from_params,
    llama_params_from_hf,
    load_hf_state_dict,
    load_pretrained_backbone,
    mpt_params_from_hf,
    resize_embeddings,
    save_hf_checkpoint,
)
