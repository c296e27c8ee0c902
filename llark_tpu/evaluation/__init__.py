from llark_tpu.evaluation.utils import (  # noqa: F401
    VALID_KEYS,
    acc_at_k,
    map_keys_to_giantsteps,
    strip_completion,
)
