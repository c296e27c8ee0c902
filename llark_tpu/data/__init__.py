from llark_tpu.data.pipeline import make_data_module  # noqa: F401
from llark_tpu.data.shards import braceexpand, expand_url_to_file_list  # noqa: F401
from llark_tpu.data.webdataset import TarShardReader, TarShardWriter  # noqa: F401
