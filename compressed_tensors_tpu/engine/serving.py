"""Continuous-batching serving engine.

The serving layer of SURVEY.md §7: fixed-slot continuous batching over a
per-slot KV cache with static shapes (TPU-friendly — no dynamic shapes under
jit). Requests queue up; finished slots are released and refilled by
prefilling the next request into the freed slot while other slots keep
decoding. All steps are jitted; slot bookkeeping is host-side.

No reference counterpart (the reference delegates serving to vLLM); this is
the engine BASELINE.json demands.
"""

from __future__ import annotations

import dataclasses
import hashlib
from collections import OrderedDict, deque
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import (
    KVCache,
    PagedKVCache,
    init_kv_cache,
    init_paged_kv_cache,
    llama_forward,
)

__all__ = ["ServingEngine", "Request", "Completion"]


class _PoolExhausted(Exception):
    """Internal: the paged KV pool has no free page (preemption signal)."""


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: list[int]
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    # resume state carried across preemption: tokens already generated (the
    # last one is the pending next-input token). Engine-internal.
    _generated: list[int] = dataclasses.field(default_factory=list,
                                              repr=False)


@dataclasses.dataclass
class Completion:
    request_id: int
    prompt_ids: list[int]
    output_ids: list[int]
    finish_reason: str  # "stop" | "length"


class ServingEngine:
    """Fixed-slot continuous batching engine.

    :param params: model params pytree (compressed weights)
    :param config: model config
    :param max_batch: number of concurrent sequence slots
    :param max_len: per-slot KV capacity (prompt + generation)
    :param steps_per_sync: decode steps fused into one jitted burst per
        host round trip (lax.scan). >1 amortizes device->host latency; a
        slot that finishes mid-burst wastes at most steps_per_sync-1 token
        computations (its extra tokens are truncated host-side)
    """

    def __init__(
        self,
        params,
        config: LlamaConfig,
        max_batch: int = 8,
        max_len: int = 512,
        prefill_chunk: int = 64,
        dtype=jnp.bfloat16,
        cache_dtype=None,
        steps_per_sync: int = 1,
        paged: bool = False,
        page_size: int = 64,
        num_pages: Optional[int] = None,
        prefix_caching: bool = True,
        use_kernels: Optional[bool] = None,
        mesh=None,
    ):
        """:param mesh: optional `jax.sharding.Mesh`. When given, params get
        tensor-parallel NamedShardings (megatron split over the "tp" axis,
        see `parallel.mesh.shard_llama_params`) and the KV cache/pool shards
        its kv-head axis over "tp" (dense layout: batch over "dp" too).
        GSPMD inserts the collectives; every host-side slot/page/prefix
        bookkeeping path below is mesh-oblivious — only array placement
        changes. This is BASELINE config 5 as a *serving* config, not just a
        forward-pass dryrun."""
        from compressed_tensors_tpu.models.llama import (
            transcode_fp8_kv_to_int8,
        )

        # fp8 KV caches re-grid to int8 on chips without fp8 conversion
        # hardware (k/v scale semantics preserved; see the helper)
        params, cache_dtype = transcode_fp8_kv_to_int8(params, cache_dtype)
        if mesh is not None:
            from compressed_tensors_tpu.parallel.mesh import (
                shard_llama_params,
            )

            params = shard_llama_params(params, mesh)
        self.mesh = mesh
        self.params = params
        self.config = config
        self.max_batch = max_batch
        self.max_len = max_len
        self.prefill_chunk = prefill_chunk
        self.dtype = dtype
        self.steps_per_sync = max(1, int(steps_per_sync))
        self.paged = paged
        self.prefix_caching = paged and prefix_caching
        # static Pallas-kernel-path switch baked into the jitted steps
        # (None = environment/backend default at trace time)
        self.use_kernels = use_kernels

        if paged:
            self.cache = init_paged_kv_cache(
                config, max_batch, max_len, num_pages=num_pages,
                page_size=page_size, dtype=dtype, cache_dtype=cache_dtype,
            )
            # host-side page allocator: free list over the pool (page 0 is
            # the null page), per-slot owned-page lists
            self._free_pages = deque(range(1, self.cache.k.shape[1]))
            self._slot_pages: list[list[int]] = [
                [] for _ in range(max_batch)
            ]
            # automatic prefix caching (vLLM-style): full prompt pages are
            # content-addressed by a sha256 hash chain over (parent digest,
            # page tokens). Refcount-0 registered pages park in an LRU of
            # reusable free pages and are only evicted (index removal) when
            # the plain free list runs dry.
            self._page_ref: dict[int, int] = {}
            self._prefix_index: dict[bytes, int] = {}
            self._page_digest: dict[int, bytes] = {}
            self._cached_free: "OrderedDict[int, bytes]" = OrderedDict()
            self.prefix_cache_hits = 0  # pages reused across requests
        else:
            self.cache: KVCache = init_kv_cache(
                config, max_batch, max_len, dtype=dtype,
                cache_dtype=cache_dtype,
            )
        if mesh is not None:
            from compressed_tensors_tpu.parallel.mesh import shard_kv_cache

            self.cache = shard_kv_cache(self.cache, mesh)
        self.tokens = jnp.zeros((max_batch,), dtype=jnp.int32)

        # host-side slot state
        self.slot_requests: list[Optional[Request]] = [None] * max_batch
        self.slot_outputs: list[list[int]] = [[] for _ in range(max_batch)]
        self.queue: deque[Request] = deque()
        self.completions: list[Completion] = []
        # admission order (preemption victims are newest-first, vLLM-style)
        self._seq = 0
        self._slot_seq = [0] * max_batch
        self.preemptions = 0

        self._build_steps()

    # ------------------------------------------------------------------ #
    def _build_steps(self):
        config = self.config
        use_kernels = self.use_kernels

        @partial(jax.jit, static_argnames=("chunk", "fresh"),
                 donate_argnames=("cache",))
        def prefill_slot(params, cache, chunk_ids, slot, start, true_len,
                         chunk: int, fresh: bool = False):
            """Prefill up to `chunk` tokens of one slot starting at `start`.

            `chunk_ids` is padded to the static bucket size `chunk`;
            `true_len` is the real token count. Only this slot's row is
            active during the forward: every other row carries the sentinel
            length -1, which skips its K/V writes inside the attention
            (kernel and eager paths both honor it) — the cache is never
            copy-masked.
            """
            B = cache.lengths.shape[0]
            row = jnp.zeros((B, chunk), dtype=jnp.int32)
            row = jax.lax.dynamic_update_index_in_dim(
                row, chunk_ids, slot, axis=0
            )
            positions = jnp.broadcast_to(
                start + jnp.arange(chunk), (B, chunk)
            )
            lengths = cache.lengths
            is_slot = jnp.arange(B) == slot
            fwd_lengths = jnp.where(is_slot, start, -1).astype(jnp.int32)
            fwd_cache = dataclasses.replace(cache, lengths=fwd_lengths)
            # `fresh` (static) routes the first chunk (start == 0) through
            # the flash-prefill kernel; continuation chunks attend over the
            # existing prefix via the jnp path
            logits, new_cache = llama_forward(params, config, row, positions,
                                              fwd_cache, fresh_prefill=fresh,
                                              use_kernels=use_kernels)
            new_lengths = jnp.where(is_slot, start + true_len, lengths)
            next_token = jnp.argmax(
                logits[slot, true_len - 1, :]
            ).astype(jnp.int32)
            return (dataclasses.replace(new_cache, lengths=new_lengths),
                    next_token)

        @partial(jax.jit, donate_argnames=("cache",))
        def decode_step(params, cache, tokens, active):
            """One decode step for all slots; inactive slots carry the
            sentinel length -1 through the forward so their cache rows are
            untouched in place (no copy-masking of cache bytes)."""
            active_b = active.astype(bool)
            lengths = cache.lengths
            fwd_lengths = jnp.where(active_b, lengths, -1).astype(jnp.int32)
            positions = fwd_lengths[:, None]
            fwd_cache = dataclasses.replace(cache, lengths=fwd_lengths)
            logits, new_cache = llama_forward(
                params, config, tokens[:, None], positions, fwd_cache,
                use_kernels=use_kernels,
            )
            next_tokens = jnp.argmax(logits[:, -1, :], axis=-1).astype(
                jnp.int32
            )
            new_lengths = jnp.where(active_b, lengths + 1, lengths)
            next_tokens = jnp.where(active_b, next_tokens, tokens)
            return (dataclasses.replace(new_cache, lengths=new_lengths),
                    next_tokens)

        @partial(jax.jit, static_argnames=("k",), donate_argnames=("cache",))
        def decode_burst(params, cache, tokens, active, k: int):
            """k decode steps in one dispatch; returns the (k, B) token
            trace for host-side truncation."""
            active_b = active.astype(bool)

            def body(carry, _):
                cache, tokens = carry
                lengths = cache.lengths
                fwd_lengths = jnp.where(active_b, lengths, -1).astype(
                    jnp.int32
                )
                fwd_cache = dataclasses.replace(cache, lengths=fwd_lengths)
                logits, new_cache = llama_forward(
                    params, config, tokens[:, None], fwd_lengths[:, None],
                    fwd_cache, use_kernels=use_kernels,
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                nxt = jnp.where(active_b, nxt, tokens)
                new_lengths = jnp.where(active_b, lengths + 1, lengths)
                cache = dataclasses.replace(new_cache, lengths=new_lengths)
                return (cache, nxt), nxt

            (cache, tokens), trace = jax.lax.scan(
                body, (cache, tokens), None, length=k
            )
            return cache, tokens, trace

        self._prefill_slot = prefill_slot
        self._decode_step = decode_step
        self._decode_burst = decode_burst

    # ------------------------------------------------------------------ #
    def submit(self, request: Request) -> None:
        if request.max_new_tokens >= self.max_len:
            # capacity invariant: prompt truncation computes
            # ids[-(max_len - max_new_tokens):], which needs a positive
            # budget, and decode must never write past max_len. Clamp into
            # an engine-internal copy — never mutate the caller's Request.
            request = dataclasses.replace(
                request,
                max_new_tokens=self.max_len - 1,
                _generated=list(request._generated),
            )
        self.queue.append(request)

    def _free_slots(self) -> list[int]:
        return [i for i, r in enumerate(self.slot_requests) if r is None]

    def _alloc_page(self) -> int:
        """Pop a free page; evict the LRU refcount-0 prefix-cached page
        when the plain free list is dry."""
        if self._free_pages:
            return self._free_pages.popleft()
        if self._cached_free:
            pid, digest = self._cached_free.popitem(last=False)
            del self._prefix_index[digest]
            del self._page_digest[pid]
            return pid
        raise _PoolExhausted

    def _ensure_pages(self, slot: int, upto_len: int) -> None:
        """Allocate pages so `slot`'s table covers positions [0, upto_len)
        (paged mode only). Transactional: on pool exhaustion every page
        grabbed by this call returns to the free list before the exception
        propagates (the caller preempts or requeues)."""
        page = self.cache.page_size
        need = -(-min(upto_len, self.max_len) // page)
        owned = self._slot_pages[slot]
        if need <= len(owned):
            return
        grabbed: list[int] = []
        try:
            for _ in range(need - len(owned)):
                grabbed.append(self._alloc_page())
        except _PoolExhausted:
            self._free_pages.extend(grabbed)
            raise
        tables = self.cache.tables
        for i, pid in enumerate(grabbed, start=len(owned)):
            self._page_ref[pid] = 1
            tables = tables.at[slot, i].set(pid)
        owned.extend(grabbed)
        self.cache = dataclasses.replace(self.cache, tables=tables)

    def _release_slot_pages(self, slot: int) -> None:
        """Drop the slot's page refs; refcount-0 pages return to the pool —
        prefix-registered ones park in the reusable LRU, the rest go to the
        free list. The table row points back at the null page."""
        if not (self.paged and self._slot_pages[slot]):
            return
        for pid in self._slot_pages[slot]:
            self._page_ref[pid] -= 1
            if self._page_ref[pid] == 0:
                del self._page_ref[pid]
                if pid in self._page_digest:
                    self._cached_free[pid] = self._page_digest[pid]
                else:
                    self._free_pages.append(pid)
        self._slot_pages[slot] = []
        self.cache = dataclasses.replace(
            self.cache, tables=self.cache.tables.at[slot].set(0)
        )

    def _preempt_newest(self) -> Optional[int]:
        """Preempt the most recently admitted active slot: free its pages
        and requeue its request (at the queue front) with the generated
        prefix carried as resume state, so re-admission prefills
        prompt+generated and decoding continues exactly where it stopped.
        Returns the victim slot, or None if no slot is active."""
        cands = [s for s, r in enumerate(self.slot_requests) if r is not None]
        if not cands:
            return None
        victim = max(cands, key=lambda s: self._slot_seq[s])
        req = self.slot_requests[victim]
        req._generated = list(self.slot_outputs[victim])
        self.queue.appendleft(req)
        self.slot_requests[victim] = None
        self.slot_outputs[victim] = []
        self._release_slot_pages(victim)
        self.preemptions += 1
        return victim

    @staticmethod
    def _page_digests(ids: list[int], page: int) -> list[bytes]:
        """sha256 hash chain over the prompt's full pages."""
        digests = []
        d = b"ct-tpu-prefix-root"
        for i in range(len(ids) // page):
            d = hashlib.sha256(
                d + np.asarray(ids[i * page:(i + 1) * page],
                               np.int64).tobytes()
            ).digest()
            digests.append(d)
        return digests

    def _match_prefix(self, slot: int, ids: list[int]) -> int:
        """Point `slot`'s leading table entries at cached pages matching
        the longest full-page prompt prefix; returns the matched token
        count (always < len(ids) so the final token is recomputed for its
        logits)."""
        page = self.cache.page_size
        digests = self._page_digests(ids, page)
        if digests and len(digests) * page == len(ids):
            digests = digests[:-1]  # keep >=1 token to prefill
        matched: list[int] = []
        for d in digests:
            pid = self._prefix_index.get(d)
            if pid is None:
                break
            matched.append(pid)
        if not matched:
            return 0
        tables = self.cache.tables
        for i, pid in enumerate(matched):
            self._cached_free.pop(pid, None)  # back in active use
            self._page_ref[pid] = self._page_ref.get(pid, 0) + 1
            tables = tables.at[slot, i].set(pid)
        self._slot_pages[slot] = list(matched)
        self.cache = dataclasses.replace(self.cache, tables=tables)
        self.prefix_cache_hits += len(matched)
        return len(matched) * page

    def _register_prefix(self, slot: int, ids: list[int]) -> None:
        """Content-address the slot's now-full prompt pages for reuse."""
        page = self.cache.page_size
        owned = self._slot_pages[slot]
        for i, d in enumerate(self._page_digests(ids, page)):
            if i >= len(owned):
                break
            pid = owned[i]
            if d not in self._prefix_index and pid not in self._page_digest:
                self._prefix_index[d] = pid
                self._page_digest[pid] = d

    def _admit(self) -> None:
        """Prefill queued requests into free slots (chunked). A preempted
        request resumes here: its prompt+generated prefix is prefilled and
        its pending next token restored, so generation continues exactly
        where preemption stopped."""
        for slot in self._free_slots():
            if not self.queue:
                break
            req = self.queue.popleft()
            gen = list(req._generated)
            ids = list(req.prompt_ids) + gen[:-1]
            # remaining decode writes: max_new - len(gen) (non-resumed:
            # max_new - 1 decode writes + 1 is the prefill-produced token)
            budget = req.max_new_tokens - max(0, len(gen) - 1)
            if len(ids) + budget > self.max_len:
                ids = ids[-(self.max_len - budget):]
            # reset slot length to 0
            self.cache = dataclasses.replace(
                self.cache, lengths=self.cache.lengths.at[slot].set(0)
            )
            start = 0
            if self.paged:
                if self.prefix_caching:
                    # reuse cached pages for the longest full-page prompt
                    # prefix; prefill resumes after it
                    start = self._match_prefix(slot, ids)
                try:
                    # prompt + the first decode step's write position
                    self._ensure_pages(slot, len(ids) + 1)
                except _PoolExhausted:
                    # admission never preempts (running requests have
                    # priority): release anything grabbed (incl. matched
                    # prefix pages), requeue, and wait for decodes to
                    # retire. If nothing is decoding, no page will ever
                    # free — fail loudly.
                    self._release_slot_pages(slot)
                    self.queue.appendleft(req)
                    if not any(r is not None for r in self.slot_requests):
                        raise RuntimeError(
                            "paged KV pool exhausted: a single sequence "
                            "needs more pages than the pool holds; raise "
                            "num_pages or lower max_len"
                        ) from None
                    return
            chunk = self.prefill_chunk
            next_token = None
            while start < len(ids):
                piece = ids[start : start + chunk]
                # pad ragged chunks up to a power-of-two bucket so the jit
                # variant count stays logarithmic (one compile per bucket,
                # not per prompt length); the pad positions write K/V past
                # the recorded length, which attention masks out and later
                # tokens overwrite
                bucket = 8
                while bucket < len(piece):
                    bucket *= 2
                bucket = min(bucket, chunk)
                if start + bucket > self.max_len:
                    # padding would spill past the cache and the clamped
                    # write would shift onto valid positions: fall back to
                    # an exact-size variant for this rare tail
                    bucket = len(piece)
                pad = bucket - len(piece)
                piece_arr = jnp.asarray(piece + [0] * pad, dtype=jnp.int32)
                self.cache, next_token = self._prefill_slot(
                    self.params, self.cache, piece_arr, slot, start,
                    len(piece), bucket, start == 0,
                )
                start += len(piece)
            if self.prefix_caching:
                self._register_prefix(slot, ids)
            if gen:
                # resumed: restore the pending next-input token; the
                # prefill's recomputed argmax is the same token (greedy)
                self.tokens = self.tokens.at[slot].set(gen[-1])
                self.slot_outputs[slot] = gen
                req._generated = []
            else:
                self.tokens = self.tokens.at[slot].set(next_token)
                self.slot_outputs[slot] = [int(next_token)]
            self.slot_requests[slot] = req
            self._seq += 1
            self._slot_seq[slot] = self._seq

    def _retire(self) -> None:
        """Release finished slots."""
        lengths = np.asarray(self.cache.lengths)
        for slot, req in enumerate(self.slot_requests):
            if req is None:
                continue
            out = self.slot_outputs[slot]
            finished_len = len(out) >= req.max_new_tokens
            finished_cap = int(lengths[slot]) >= self.max_len - 1
            finished_eos = (req.eos_token_id is not None and len(out) > 0
                            and out[-1] == req.eos_token_id)
            if finished_len or finished_eos or finished_cap:
                self.completions.append(Completion(
                    request_id=req.request_id,
                    prompt_ids=list(req.prompt_ids),
                    output_ids=list(out),
                    finish_reason="stop" if finished_eos else "length",
                ))
                self.slot_requests[slot] = None
                self.slot_outputs[slot] = []
                self._release_slot_pages(slot)

    def step(self) -> None:
        """One engine iteration: admit, decode (burst), collect, retire."""
        self._retire()
        self._admit()
        # a prompt's first generated token may already finish the request
        self._retire()
        if not any(r is not None for r in self.slot_requests):
            return
        # burst length: bounded by the tightest remaining budget/capacity so
        # no slot writes past its cache or computes far past its stop.
        # Post-retire every active slot has remaining >= 1 and cap >= 1.
        lengths = np.asarray(self.cache.lengths)
        burst = self.steps_per_sync
        for slot, req in enumerate(self.slot_requests):
            if req is None:
                continue
            remaining = req.max_new_tokens - len(self.slot_outputs[slot])
            cap = self.max_len - 1 - int(lengths[slot])
            burst = min(burst, max(1, min(remaining, cap)))

        if self.paged:
            # every step writes at the slot's current length: cover the
            # whole burst's write positions before dispatch. Pool pressure
            # preempts the newest active slot (freed pages + requeue with
            # the generated prefix) until the rest fit.
            for slot in range(self.max_batch):
                while self.slot_requests[slot] is not None:
                    try:
                        self._ensure_pages(slot, int(lengths[slot]) + burst)
                        break
                    except _PoolExhausted:
                        cands = [s for s, r in enumerate(self.slot_requests)
                                 if r is not None]
                        if not cands:  # pragma: no cover — defensive
                            raise RuntimeError(
                                "paged KV pool exhausted with no slot to "
                                "preempt; raise num_pages"
                            ) from None
                        victim = max(cands, key=lambda s: self._slot_seq[s])
                        if victim == slot:
                            # Preempting this slot itself cannot create
                            # room for its own burst: re-admission prefills
                            # the same prefix and the same ensure fails
                            # again (livelock). Shrink the burst first;
                            # only self-preempt if other slots can still
                            # make progress and free pages later.
                            if burst > 1:
                                burst = 1
                                continue
                            if len(cands) == 1:
                                raise RuntimeError(
                                    "paged KV pool exhausted: the last "
                                    "active sequence cannot cover its next "
                                    "decode write even at burst=1; raise "
                                    "num_pages or lower max_len"
                                ) from None
                        self._preempt_newest()

        reqs = [r for r in self.slot_requests if r is not None]
        if not reqs:
            return
        active = jnp.asarray(
            [1 if r is not None else 0 for r in self.slot_requests],
            dtype=jnp.int32,
        )
        if burst == 1:
            self.cache, self.tokens = self._decode_step(
                self.params, self.cache, self.tokens, active
            )
            trace = np.asarray(self.tokens)[None]
        else:
            self.cache, self.tokens, trace = self._decode_burst(
                self.params, self.cache, self.tokens, active, burst
            )
            trace = np.asarray(trace)
        for slot, req in enumerate(self.slot_requests):
            if req is None:
                continue
            for k in range(trace.shape[0]):
                out = self.slot_outputs[slot]
                if len(out) >= req.max_new_tokens:
                    break
                if (req.eos_token_id is not None and out
                        and out[-1] == req.eos_token_id):
                    break  # truncate tokens generated past EOS mid-burst
                out.append(int(trace[k, slot]))
        self._retire()

    def run(self, max_steps: int = 10_000) -> list[Completion]:
        """Run until all submitted requests complete."""
        steps = 0
        while (self.queue or any(r is not None for r in self.slot_requests)) \
                and steps < max_steps:
            self.step()
            steps += 1
        done = self.completions
        self.completions = []
        return done
