from quantizedmha_tpu.parallel.mesh import make_mesh
from quantizedmha_tpu.parallel.combine import merge_partial_attention
from quantizedmha_tpu.parallel.shard import head_parallel_attention
from quantizedmha_tpu.parallel.ring import ring_attention, context_parallel_attention

__all__ = [
    "make_mesh",
    "merge_partial_attention",
    "head_parallel_attention",
    "ring_attention",
    "context_parallel_attention",
]
