from llark_tpu.instruct import FewShotExample  # noqa: F401
