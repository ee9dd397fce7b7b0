from dgcnn_tpu.utils.cache import enable_compilation_cache
from dgcnn_tpu.utils.io import IOStream

__all__ = ["enable_compilation_cache", "IOStream"]
