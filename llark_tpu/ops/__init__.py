from llark_tpu.ops.attention import multihead_attention, xla_attention  # noqa: F401
