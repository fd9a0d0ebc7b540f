from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.kv_cache import (
    PageAllocator,
    PagedKVCacheState,
    append_token,
    write_pages,
)
from quantizedmha_tpu.serving.sharded import TPEngine, make_tp_mesh

__all__ = [
    "Engine",
    "EngineConfig",
    "TPEngine",
    "make_tp_mesh",
    "PageAllocator",
    "PagedKVCacheState",
    "append_token",
    "write_pages",
]
