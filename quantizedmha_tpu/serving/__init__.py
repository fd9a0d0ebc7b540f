from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.kv_cache import (
    PageAllocator,
    PagedKVCacheState,
    append_token,
    write_pages,
)

__all__ = [
    "Engine",
    "EngineConfig",
    "PageAllocator",
    "PagedKVCacheState",
    "append_token",
    "write_pages",
]
