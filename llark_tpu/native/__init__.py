from llark_tpu.native.build import load_library  # noqa: F401
