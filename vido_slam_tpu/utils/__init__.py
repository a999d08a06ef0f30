from vido_slam_tpu.utils.jaxcache import enable_compilation_cache  # noqa: F401
from vido_slam_tpu.utils.verbose import Verbose  # noqa: F401
