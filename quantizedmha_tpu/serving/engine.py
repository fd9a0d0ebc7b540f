"""Continuous-batching inference engine.

The serving scope BASELINE.json adds beyond the reference: requests stream
in, are admitted when the paged INT8 KV cache has room, prefill runs per
request (shape-bucketed to avoid recompilation churn), and all active
sequences decode together one token per step. Finished sequences release
their pages immediately, letting queued requests join mid-flight — classic
continuous batching.

Host/device split: the scheduler (admission, page tables, sampling argmax
results) is host Python; all tensor work (prefill, decode_step, cache
writes) is jitted and shape-stable (fixed max_batch, bucketed prompt
lengths), so there is no per-step recompilation.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig
from quantizedmha_tpu.serving import llama_adapter
from quantizedmha_tpu.serving.kv_cache import PageAllocator, PagedKVCacheState
from quantizedmha_tpu.utils.metrics import Metrics


@dataclasses.dataclass
class EngineConfig:
    num_pages: int = 128
    page_size: int = 128
    max_batch: int = 8
    max_pages_per_seq: int = 16
    prefill_buckets: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    eos_id: Optional[int] = None
    max_new_tokens: int = 64


@dataclasses.dataclass
class _Sequence:
    seq_id: int
    prompt: List[int]
    out: List[int]
    pending: int  # sampled token whose K/V is not yet in the cache
    max_new: int

    @property
    def done_by_len(self) -> bool:
        return len(self.out) >= self.max_new


class Engine:
    def __init__(self, cfg: LlamaConfig, params: Dict[str, Any], ecfg: EngineConfig):
        self.cfg = cfg
        self.params = params
        self.ecfg = ecfg
        self.cache = llama_adapter.make_cache(cfg, ecfg.num_pages, ecfg.page_size)
        # Page 0 is reserved as the scrap target for padded batch lanes.
        self.alloc = PageAllocator(ecfg.num_pages, ecfg.page_size)
        self.alloc._free.remove(0)
        self.queue: deque = deque()
        self.active: List[_Sequence] = []
        self.finished: Dict[int, List[int]] = {}
        self._next_id = 0
        self.metrics = Metrics()

        self._prefill = jax.jit(
            functools.partial(llama_adapter.prefill_at, cfg),
        )
        self._decode = jax.jit(functools.partial(llama_adapter.decode_step, cfg))
        self._write = jax.jit(
            functools.partial(llama_adapter.write_prefill, cfg),
            static_argnames=("page_size",),
        )

    # -- request lifecycle ---------------------------------------------------

    def add_request(self, prompt_tokens: List[int], max_new: Optional[int] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, list(prompt_tokens), max_new or self.ecfg.max_new_tokens))
        return rid

    def _bucket(self, n: int) -> int:
        for b in self.ecfg.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest bucket")

    def _try_admit(self) -> bool:
        if not self.queue or len(self.active) >= self.ecfg.max_batch:
            return False
        rid, prompt, max_new = self.queue[0]
        n = len(prompt)
        if not self.alloc.can_admit(n):
            return False
        self.queue.popleft()
        pages = self.alloc.admit(rid, n)
        bucket = self._bucket(n)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = prompt
        with self.metrics.timed("prefill"):
            logits, k_all, v_all = self._prefill(
                self.params, jnp.asarray(toks), jnp.int32(n - 1)
            )
        self.metrics.inc("requests_admitted")
        self.metrics.inc("prefill_tokens", n)
        n_write = len(pages) * self.ecfg.page_size
        self.cache = self._write(
            self.cache,
            k_all[:, :, :n_write],
            v_all[:, :, :n_write],
            jnp.asarray(pages, jnp.int32),
            page_size=self.ecfg.page_size,
        )
        first = int(jnp.argmax(logits[0]))
        self.active.append(_Sequence(rid, prompt, [first], first, max_new))
        return True

    # -- one engine step -----------------------------------------------------

    def step(self) -> None:
        while self._try_admit():
            pass
        if not self.active:
            return

        B = self.ecfg.max_batch
        nseq = len(self.active)
        tokens = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        page_ids = np.zeros(B, np.int32)
        slots = np.zeros(B, np.int32)
        lengths = np.ones(B, np.int32)
        for i, seq in enumerate(self.active):
            pos = self.alloc.lengths[seq.seq_id]  # 0-based position of pending
            pid, slot, _ = self.alloc.extend(seq.seq_id)
            tokens[i] = seq.pending
            positions[i] = pos
            page_ids[i] = pid
            slots[i] = slot
            lengths[i] = self.alloc.lengths[seq.seq_id]
        tables = self.alloc.block_table_array(
            [s.seq_id for s in self.active], self.ecfg.max_pages_per_seq
        )
        tables_full = np.zeros((B, self.ecfg.max_pages_per_seq), np.int32)
        tables_full[:nseq] = tables

        with self.metrics.timed("decode_step"):
            logits, self.cache = self._decode(
                self.params, self.cache,
                jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(page_ids),
                jnp.asarray(slots), jnp.asarray(lengths), jnp.asarray(tables_full),
            )
            next_tokens = np.asarray(jnp.argmax(logits, axis=-1))
        self.metrics.inc("decode_steps")
        self.metrics.inc("tokens_generated", nseq)
        self.metrics.set("active_sequences", nseq)
        self.metrics.set("free_pages", len(self.alloc._free))

        still_active = []
        for i, seq in enumerate(self.active):
            tok = int(next_tokens[i])
            seq.out.append(tok)
            seq.pending = tok
            eos = self.ecfg.eos_id is not None and tok == self.ecfg.eos_id
            if seq.done_by_len or eos:
                self.finished[seq.seq_id] = seq.out
                self.alloc.release(seq.seq_id)
                self.metrics.inc("requests_finished")
            else:
                still_active.append(seq)
        self.active = still_active

    def run(self) -> Dict[int, List[int]]:
        """Drive until queue and active set drain; returns {req_id: tokens}."""
        while self.queue or self.active:
            before = len(self.finished)
            self.step()
            if not self.active and self.queue and len(self.finished) == before:
                # Nothing could be admitted and nothing is running: the head
                # request needs more pages than the cache has.
                rid, prompt, _ = self.queue[0]
                raise RuntimeError(
                    f"request {rid} (len {len(prompt)}) cannot fit in the cache"
                )
        return dict(self.finished)
