from quantizedmha_tpu.parallel.mesh import make_mesh
from quantizedmha_tpu.parallel.distributed import (
    audit_fn_by_axis,
    classify_collectives,
    hybrid_mesh,
    initialize_multihost,
)
from quantizedmha_tpu.parallel.combine import merge_partial_attention
from quantizedmha_tpu.parallel.shard import head_parallel_attention
from quantizedmha_tpu.parallel.pipeline import pipeline_llama_forward
from quantizedmha_tpu.parallel.ring import (
    context_parallel_attention,
    ring_attention,
    ring_attention_int8,
)

__all__ = [
    "make_mesh",
    "hybrid_mesh",
    "initialize_multihost",
    "classify_collectives",
    "audit_fn_by_axis",
    "merge_partial_attention",
    "head_parallel_attention",
    "ring_attention",
    "ring_attention_int8",
    "context_parallel_attention",
    "pipeline_llama_forward",
]
