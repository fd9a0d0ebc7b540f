"""Speculative decoding: a small draft model proposes, the target model
verifies a whole block of tokens in one forward.

No reference analog (the reference has no decoding at all, SURVEY.md §2) —
north-star serving scope.

Losslessness: with greedy sampling the emitted stream is token-for-token
identical to plain greedy decoding of the target (argmax-match
verification; tests gate this). With temperature > 0, verification is
REJECTION SAMPLING (serving/sampling.rejection_sample): accept draft x_j
with prob min(1, p_j(x)/q_j(x)), replace from the residual on rejection —
exact IN DISTRIBUTION vs sampling the target with the same params. The
speedup comes from the target model reading its weights once per accepted
block instead of once per token; the draft's cost is proportional to its
(much smaller) size.

Mechanics per round, for every active sequence in the batch:
  1. draft proposes `k` tokens with its own fused decode loop (its own
     paged cache);
  2. target runs `verify_step`: ONE batched forward over [pending, d_1..d_k]
     that appends K/V for all k+1 positions and returns k+1 logits;
  3. host accepts the longest prefix where draft tokens match the target's
     argmax; on a mismatch it emits the accepted drafts plus the target's
     correction token, on full acceptance it emits all k drafts (no bonus
     token — see the cache-alignment note in _step_speculate);
  4. both caches ROLL BACK to the accepted length (allocator-only: slots
     are position-indexed, stale K/V is overwritten later).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, List

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig
from quantizedmha_tpu.serving import llama_adapter
from quantizedmha_tpu.serving.engine import Engine, EngineConfig


@dataclasses.dataclass
class SpecConfig:
    num_draft_tokens: int = 4  # k
    # Adaptive k: tune the draft length between rounds from an EMA of the
    # per-round acceptance fraction — high acceptance earns longer drafts
    # (fewer target forwards per token), low acceptance shortens them
    # (less wasted draft compute). Each DISTINCT k compiles its own
    # draft-loop/verify programs once (shape-stable thereafter), so the
    # [min_k, max_k] range bounds compilation count.
    adaptive: bool = False
    min_k: int = 1
    max_k: int = 8
    ema_decay: float = 0.8
    grow_above: float = 0.8   # EMA acceptance fraction to lengthen drafts
    shrink_below: float = 0.4

    def validate(self) -> "SpecConfig":
        if self.num_draft_tokens < 1:
            raise ValueError(
                f"num_draft_tokens must be >= 1 (0 would emit no tokens "
                f"and spin forever), got {self.num_draft_tokens}")
        if self.adaptive:
            if not 1 <= self.min_k <= self.num_draft_tokens <= self.max_k:
                raise ValueError(
                    f"adaptive k needs min_k <= num_draft_tokens <= max_k, "
                    f"got {self.min_k}/{self.num_draft_tokens}/{self.max_k}")
            if not self.shrink_below < self.grow_above:
                raise ValueError("shrink_below must be < grow_above")
        return self


class SpecDecodeEngine(Engine):
    """Continuous-batching engine with draft-model speculation.

    Greedy sampling verifies by argmax match (token-exact vs plain greedy
    decode); temperature>0 uses rejection sampling (sampling.
    rejection_sample) — exact IN DISTRIBUTION vs plain sampling of the
    target with the same SamplingParams.
    """

    def __init__(self, cfg: LlamaConfig, params: Dict[str, Any],
                 draft_cfg: LlamaConfig, draft_params: Dict[str, Any],
                 ecfg: EngineConfig, scfg: Optional[SpecConfig] = None):
        scfg = (scfg if scfg is not None else SpecConfig()).validate()
        if ecfg.decode_chunk != 1:
            raise ValueError("decode_chunk and speculation are exclusive")
        if ecfg.mixed_kv is not None:
            raise ValueError(
                "mixed_kv does not compose with speculation yet (the "
                "verify step would need the mixed q_len>1 kernel plumbed "
                "through verify_step, and rollback a boundary-aware form)")
        if draft_cfg.vocab_size != cfg.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        super().__init__(cfg, params, ecfg)
        self.scfg = scfg
        self._k = scfg.num_draft_tokens
        self._accept_ema: Optional[float] = None
        self.draft_cfg = draft_cfg
        self.draft_params = draft_params
        # The draft gets its own cache + allocator(s) over the same page
        # layout. Under hybrid_kv each model's OWN window pattern decides
        # whether it gets grouped pools — a uniform draft stays single-pool
        # even when the pattern target goes hybrid, and vice versa.
        from quantizedmha_tpu.serving.engine import build_pools

        (self.draft_cache, self.draft_allocs, self.draft_alloc,
         self.draft_hybrid) = build_pools(draft_cfg, ecfg)
        self.draft_group_windows = {
            llama_adapter.group_key(w): w
            for w in set(draft_cfg.layer_windows)}

        self._draft_prefill = jax.jit(
            functools.partial(llama_adapter.prefill_at, draft_cfg))
        self._draft_prefill_chunk = jax.jit(
            functools.partial(llama_adapter.prefill_chunk, draft_cfg),
            static_argnames=("page_size",))
        self._draft_write = jax.jit(
            functools.partial(llama_adapter.write_prefill, draft_cfg),
            static_argnames=("page_size",))
        self._draft_write_hybrid = jax.jit(
            functools.partial(llama_adapter.write_prefill_hybrid, draft_cfg),
            static_argnames=("page_size",))
        # The draft SAMPLES with the engine's params (greedy drafts under a
        # non-greedy config would make q a point mass and bias rejection
        # sampling — q must be the distribution the proposals were drawn
        # from, and decode_loop + rejection_sample share one warp).
        self._draft_loop = jax.jit(
            functools.partial(llama_adapter.decode_loop, draft_cfg,
                              sampling=ecfg.sampling),
            static_argnames=("n_steps", "page_size", "return_logits"))
        self._verify = jax.jit(
            functools.partial(llama_adapter.verify_step, cfg),
            static_argnames=("page_size",))
        if not self.sampling.greedy:
            from quantizedmha_tpu.serving.sampling import rejection_sample

            self._rejection = jax.jit(functools.partial(
                rejection_sample, params=self.sampling))

    # -- admission: prefill BOTH models ---------------------------------------
    #
    # Hooks into Engine's skip-ahead admission: _fits gates on BOTH pools
    # (lockstep), _dispatch_admit runs the target path (bucketed, chunked,
    # or prefix-cached) then mirrors the prefill on the draft side for
    # exactly the request that was dispatched — whichever queue position it
    # came from. The draft never shares prefix pages (its cache is
    # independent), so under prefix_cache it simply prefills fully.

    def _draft_each_alloc(self):
        return (list(self.draft_allocs.values()) if self.draft_hybrid
                else [self.draft_alloc])

    def _draft_admit_all(self, rid, n):
        """Mirror of Engine._admit_all for the draft pools (all-or-nothing)."""
        if not self.draft_hybrid:
            return self.draft_alloc.admit(rid, n)
        short = [k for k, a in self.draft_allocs.items()
                 if not a.can_admit(n)]
        if short:
            raise RuntimeError(
                f"out of draft pages in group(s) {sorted(short)} "
                f"admitting {n} tokens")
        return {k: a.admit(rid, n) for k, a in self.draft_allocs.items()}

    def _fits(self, prompt) -> bool:
        return super()._fits(prompt) and all(
            a.can_admit(len(prompt)) for a in self._draft_each_alloc())

    def _dispatch_admit(self, rid, prompt, max_new) -> None:
        super()._dispatch_admit(rid, prompt, max_new)
        if any(t.rid == rid for t in self.prefilling):
            # Interleaved chunked prefill: reserve draft pages NOW (so a
            # later admission can't race them away) but defer the draft's
            # chunk prefills to _on_prefill_complete — the draft cache is
            # only read once decoding starts.
            self._draft_reserve_chunked(rid, prompt)
            return
        if all(seq.seq_id != rid for seq in self.active):
            # Finished at activation (EOS on the prefill token / max_new=1):
            # the target already released; skip the draft prefill entirely —
            # admitting it would LEAK draft pages (nothing releases a seq
            # that never becomes active).
            return
        n = len(prompt)
        if n > max(self.ecfg.prefill_buckets):
            self._draft_admit_chunked(rid, prompt)
            self._trim_draft()
            return
        pages = self._draft_admit_all(rid, n)
        n_pages = self.draft_alloc.pages_needed(n)
        bucket = self._bucket(n)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = prompt
        _, k_all, v_all = self._draft_prefill(
            self.draft_params, jnp.asarray(toks), jnp.int32(n - 1))
        # Zero padded rows before the page write (scale-inflation guard,
        # same as Engine's bucketed admission).
        n_write = n_pages * self.ecfg.page_size
        k_w = k_all[:, :, :n_write]
        v_w = v_all[:, :, :n_write]
        if n < n_write:
            keep = (jnp.arange(n_write) < n)[None, None, :, None]
            k_w = k_w * keep
            v_w = v_w * keep
        if self.draft_hybrid:
            self.draft_cache = self._draft_write_hybrid(
                self.draft_cache, k_w, v_w,
                {k: jnp.asarray(p, jnp.int32) for k, p in pages.items()},
                page_size=self.ecfg.page_size)
        else:
            self.draft_cache = self._draft_write(
                self.draft_cache, k_w, v_w,
                jnp.asarray(pages, jnp.int32), page_size=self.ecfg.page_size)
        self._trim_draft()

    def _on_prefill_complete(self, rid, prompt) -> None:
        """Deferred draft mirror for interleaved chunked prefill: the
        target's final chunk just landed. Draft PAGES were already
        reserved at dispatch (no reservation race against other
        admissions); here we either run the draft's chunk prefills over
        them — the draft is the SMALL model, so decode jitter stays
        O(chunk + draft prefill), not O(target prefill) — or, if the
        sequence finished at activation (EOS on the prefill token /
        max_new=1), release the reservation."""
        if all(s.seq_id != rid for s in self.active):
            for a in self._draft_each_alloc():
                a.release(rid)
            return
        self._draft_prefill_chunks(rid, prompt)
        self._trim_draft()

    def _draft_reserve_chunked(self, rid, prompt) -> None:
        """Admit draft pages for an interleaved chunked prefill at
        DISPATCH time (table fixed, K/V written later by
        _on_prefill_complete)."""
        chunk = max(self.ecfg.prefill_buckets)
        n_chunks_total = -(-len(prompt) // chunk)
        if (n_chunks_total * chunk // self.ecfg.page_size
                > self.ecfg.max_pages_per_seq):
            raise ValueError(
                f"request {rid}: draft chunked prefill exceeds "
                f"max_pages_per_seq ({self.ecfg.max_pages_per_seq})")
        self._draft_admit_all(rid, len(prompt))

    def _draft_admit_chunked(self, rid, prompt) -> None:
        """Draft-side mirror of Engine._admit_chunked: prefill the long
        prompt into the DRAFT paged cache chunk by chunk (logits discarded;
        only the cached K/V matters for future draft proposals)."""
        self._draft_reserve_chunked(rid, prompt)
        self._draft_prefill_chunks(rid, prompt)

    def _draft_prefill_chunks(self, rid, prompt) -> None:
        chunk = max(self.ecfg.prefill_buckets)
        n_chunks_total = -(-len(prompt) // chunk)
        if self.draft_hybrid:
            table_j = {
                k: jnp.asarray(a.block_table_array(
                    [rid], self.ecfg.max_pages_per_seq)[0], jnp.int32)
                for k, a in self.draft_allocs.items()}
        else:
            table_j = jnp.asarray(self.draft_alloc.block_table_array(
                [rid], self.ecfg.max_pages_per_seq)[0], jnp.int32)
        for ci in range(n_chunks_total):
            part = prompt[ci * chunk:(ci + 1) * chunk]
            toks = np.zeros((1, chunk), np.int32)
            toks[0, :len(part)] = part
            _, self.draft_cache = self._draft_prefill_chunk(
                self.draft_params, self.draft_cache, jnp.asarray(toks),
                jnp.int32(ci * chunk), table_j, jnp.int32(len(part) - 1),
                page_size=self.ecfg.page_size,
            )

    # -- one speculation round -------------------------------------------------

    def step(self) -> None:
        while self._try_admit():
            pass
        self._prefill_tick()
        if not self.active:
            return
        self._step_speculate(self._k)
        if self.scfg.adaptive:
            self._adapt_k()

    def _adapt_k(self) -> None:
        """Move k by one step when the acceptance EMA leaves the
        [shrink_below, grow_above] band; the EMA resets on change so a new
        k is judged on its own rounds."""
        if self._accept_ema is None:
            return
        k = self._k
        if self._accept_ema > self.scfg.grow_above and k < self.scfg.max_k:
            self._k = k + 1
        elif self._accept_ema < self.scfg.shrink_below and k > self.scfg.min_k:
            self._k = k - 1
        if self._k != k:
            self.metrics.inc("spec_k_changes")
            self.metrics.set("spec_k", self._k)
            self._accept_ema = None

    def _reserve(self, allocs, seq_ids, count) -> None:
        for alloc in allocs:
            for sid in seq_ids:
                for _ in range(count):
                    alloc.extend(sid)

    def _trim_draft(self) -> None:
        """Draft-side window recycling (mirror of Engine._trim_windows):
        per-group windows under draft hybrid, recyclable_window otherwise.
        Caller ordering contract: only AFTER rollbacks/prefills commit."""
        if self.draft_hybrid:
            for k, a in self.draft_allocs.items():
                w = self.draft_group_windows[k]
                if not w:
                    continue
                for seq in self.active:
                    a.trim_window(seq.seq_id, w,
                                  self.draft_cfg.attention_sinks)
            return
        draft_w = self.draft_cfg.recyclable_window
        if draft_w:
            for seq in self.active:
                self.draft_alloc.trim_window(
                    seq.seq_id, draft_w, self.draft_cfg.attention_sinks)

    def _step_speculate(self, k: int) -> None:
        B = self.ecfg.max_batch
        S = k + 1
        nseq = len(self.active)
        seq_ids = [s.seq_id for s in self.active]
        page_size = self.ecfg.page_size
        max_pages = self.ecfg.max_pages_per_seq

        tokens0 = np.zeros(B, np.int32)
        lengths0 = np.ones(B, np.int32)
        for i, seq in enumerate(self.active):
            tokens0[i] = seq.pending
            # Both allocators are rolled back to the same committed length
            # every round and admitted with the same n, so one lengths
            # array drives both loops.
            lengths0[i] = self.alloc.lengths[seq.seq_id]
        # Pool-headroom + per-seq table guards BEFORE any allocator/cache
        # mutation: a mid-_reserve failure would desync host lengths from
        # the device caches (Engine.step has the same guard).
        for a in self._draft_each_alloc():
            self._check_extend_headroom(k, alloc=a)
        self._check_extend_headroom(S)

        # 1. draft proposes k tokens (fused loop on the draft cache).
        greedy = self.sampling.greedy
        self._reserve(self._draft_each_alloc(), seq_ids, k)
        d_tables = self._tables_for(
            seq_ids, B,
            allocs=self.draft_allocs if self.draft_hybrid
            else self.draft_alloc)
        with self.metrics.timed("draft"):
            self._key, loop_key = jax.random.split(self._key)
            d_logits = None
            if greedy:
                drafts_j, self.draft_cache = self._draft_loop(
                    self.draft_params, self.draft_cache,
                    jnp.asarray(tokens0), jnp.asarray(lengths0),
                    d_tables, loop_key,
                    n_steps=k, page_size=page_size)
            else:
                # Rejection sampling needs the draft's per-position
                # distribution (its q) alongside the proposals.
                drafts_j, self.draft_cache, d_logits = self._draft_loop(
                    self.draft_params, self.draft_cache,
                    jnp.asarray(tokens0), jnp.asarray(lengths0),
                    d_tables, loop_key,
                    n_steps=k, page_size=page_size, return_logits=True)
            drafts = np.asarray(drafts_j)  # [k, B]

        # 2. target verifies pending + drafts in one forward. Tables stay
        # host-side numpy until the single upload below — sched_from
        # indexes them on the host, and a jnp round-trip here would add a
        # blocking device sync to every speculation round.
        self._reserve(self._each_alloc(), seq_ids, S)
        t_tables_h = self._tables_for(seq_ids, B, host=True)
        fed = np.zeros((B, S), np.int32)
        fed[:, 0] = tokens0
        fed[:, 1:] = drafts.T
        pos = lengths0[:, None] + np.arange(S, dtype=np.int32)[None, :]

        def sched_from(tbl):
            return jnp.asarray(np.take_along_axis(
                tbl, pos // page_size, axis=1).astype(np.int32))

        if self.hybrid:
            page_sched = {k_: sched_from(t) for k_, t in t_tables_h.items()}
        else:
            page_sched = sched_from(t_tables_h)
        t_tables = jax.tree.map(jnp.asarray, t_tables_h)
        slot_sched = (pos % page_size).astype(np.int32)
        with self.metrics.timed("verify"):
            logits, self.cache = self._verify(
                self.params, self.cache, jnp.asarray(fed),
                jnp.asarray(lengths0), page_sched,
                jnp.asarray(slot_sched), t_tables,
                page_size=page_size)
            if greedy:
                target = np.asarray(jnp.argmax(logits, axis=-1))  # [B, S]
            else:
                # Device-side rejection sampling: accept/replace without
                # shipping [B, S, vocab] logits to the host. logits[:, j]
                # is the target distribution for the token at position
                # L+j, i.e. aligned with draft position j for j < k.
                self._key, rkey = jax.random.split(self._key)
                n_acc_j, repl_j = self._rejection(
                    jnp.transpose(d_logits, (1, 0, 2)), logits[:, :k],
                    jnp.asarray(drafts.T), rkey)
                n_acc = np.asarray(n_acc_j)    # [B]
                repl = np.asarray(repl_j)      # [B]

        # 3. host acceptance + 4. rollbacks.
        #
        # Cache-alignment invariant: the draft loop caches K/V for positions
        # L..L+k-1 (pending + first k-1 drafts) — it never caches d_k. So on
        # full acceptance the "bonus" token is NOT emitted; pending becomes
        # d_k itself and both caches roll back to L+a(+1), staying aligned
        # every round (d_k's K/V is recomputed as next round's pending —
        # one token of recompute instead of a draft catch-up pass).
        self.metrics.inc("spec_rounds")
        still_active = []
        for i, seq in enumerate(self.active):
            if greedy:
                accepted = 0
                while accepted < k and drafts[accepted, i] == target[i, accepted]:
                    accepted += 1
                correction = int(target[i, accepted]) if accepted < k else None
            else:
                accepted = int(n_acc[i])
                correction = int(repl[i]) if accepted < k else None
            if accepted < k:
                # accepted drafts + the correction token (greedy: the
                # target argmax; sampled: the residual-distribution draw).
                emitted = [int(t) for t in drafts[:accepted, i]] + [correction]
                new_len = int(lengths0[i]) + accepted + 1
            else:
                # all k accepted: emit them; d_k becomes the new pending.
                emitted = [int(t) for t in drafts[:, i]]
                new_len = int(lengths0[i]) + k
            self.metrics.inc("draft_tokens_proposed", k)
            self.metrics.inc("draft_tokens_accepted", accepted)
            frac = accepted / k
            self._accept_ema = (
                frac if self._accept_ema is None
                else self.scfg.ema_decay * self._accept_ema
                + (1 - self.scfg.ema_decay) * frac)

            for a in self._each_alloc():
                a.rollback(seq.seq_id, new_len)
            for a in self._draft_each_alloc():
                a.rollback(seq.seq_id, new_len)

            finished = False
            for tok in emitted:
                seq.out.append(tok)
                seq.pending = tok
                self.metrics.inc("tokens_generated")
                eos = self.ecfg.eos_id is not None and tok == self.ecfg.eos_id
                if seq.done_by_len or eos:
                    finished = True
                    break
            if finished:
                self.finished[seq.seq_id] = seq.out
                for a in self._each_alloc():
                    a.release(seq.seq_id)
                for a in self._draft_each_alloc():
                    a.release(seq.seq_id)
                self.metrics.inc("requests_finished")
            else:
                still_active.append(seq)
        self.active = still_active
        # Rolling-window page recycling for BOTH caches (after the
        # rollback commits — trim_window's documented ordering).
        self._trim_windows()
        self._trim_draft()
        self.metrics.set("free_pages", self.alloc.free_pages)

    @property
    def acceptance_rate(self) -> float:
        prop = self.metrics.counter("draft_tokens_proposed")
        return self.metrics.counter("draft_tokens_accepted") / prop if prop else 0.0
