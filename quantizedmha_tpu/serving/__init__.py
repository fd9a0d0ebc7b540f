from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.kv_cache import (
    MixedPageAllocator,
    PageAllocator,
    PagedKVCacheState,
    append_token,
    write_pages,
)
from quantizedmha_tpu.serving.mixed_kv import (
    MixedPagedKVState,
    append_token_mixed,
    mixed_paged_decode_attention,
    mixed_paged_prefill_attention,
)
from quantizedmha_tpu.serving.sampling import SamplingParams
from quantizedmha_tpu.serving.sharded import (
    TPEngine,
    TPSpecDecodeEngine,
    make_tp_mesh,
)
from quantizedmha_tpu.serving.speculative import SpecConfig, SpecDecodeEngine

__all__ = [
    "Engine",
    "EngineConfig",
    "TPEngine",
    "TPSpecDecodeEngine",
    "make_tp_mesh",
    "SamplingParams",
    "SpecConfig",
    "SpecDecodeEngine",
    "MixedPagedKVState",
    "append_token_mixed",
    "mixed_paged_decode_attention",
    "mixed_paged_prefill_attention",
    "MixedPageAllocator",
    "PageAllocator",
    "PagedKVCacheState",
    "append_token",
    "write_pages",
]
