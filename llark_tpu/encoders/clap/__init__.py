from llark_tpu.encoders.clap.encode import ClapEncoder  # noqa: F401
from llark_tpu.encoders.clap.htsat import HTSATConfig  # noqa: F401
