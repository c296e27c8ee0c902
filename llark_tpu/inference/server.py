"""Continuous-batching serving engine.

The reference serves batch=1, one request at a time
(scripts/inference/infer_from_webdataset.py:84-151). Production TPU
serving wants the decode step to stay batched while requests arrive and
finish at different times. This engine keeps ONE persistent batched KV
cache of `max_batch` slots and:

  * prefills each incoming request as a single row (one compiled b=1
    prefill per prompt bucket) and splices it into a free slot of the
    batched cache with a jitted dynamic_update_slice — no recompile, no
    batch-wide stall;
  * decodes all slots together in chunked lax.scan steps (per-row write
    positions, so rows at different depths coexist in one program);
  * retires rows on max_new_tokens / stop-text / EOS and immediately
    reuses their slots for queued requests.

Everything on-device is fixed-shape: one prefill program per prompt
bucket and one decode program total, compiled once.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig
from llark_tpu.generate import (
    GenerationConfig,
    make_multistep_decode_fn,
    make_prefill_chunk_fn,
    make_prefill_fn,
    make_prefill_last_fn,
)

log = logging.getLogger(__name__)


@dataclass
class Request:
    input_ids: np.ndarray  # [S] int32 (unpadded)
    audio_encoding: Optional[np.ndarray] = None  # [T, mm] f32
    # per-request token budget; clamped to the server-level
    # gen_cfg.max_new_tokens so serve()'s capacity math stays valid
    max_new_tokens: Optional[int] = None
    # filled by the engine:
    tokens: List[int] = field(default_factory=list)
    done: bool = False
    error: Optional[str] = None  # set by the online engine on failure
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None


class BatchedServer:
    """Continuous-batching engine over a fixed slot count."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        audio_patch_id: int,
        gen_cfg: Optional[GenerationConfig] = None,
        *,
        max_batch: int = 4,
        max_cache_len: int = 1024,
        prompt_buckets: tuple = (128, 512),
        max_audio_frames: int = 60,
        decode_chunk: int = 8,
        decode_chunk_drain: Optional[int] = None,
        drain_max_active: Optional[int] = None,
        prefill_chunk: Optional[int] = None,
        tokenizer=None,
        draft_cfg: Optional[ModelConfig] = None,
        draft_params=None,
        gamma: int = 4,
        spec_rounds: int = 2,
        shared_prefix_ids: Optional[np.ndarray] = None,
        spec_mode: Optional[str] = None,
        spec_proposer=None,
        ngram_max_k: int = 3,
        spec_force_accept: Optional[float] = None,
        kv_block_size: Optional[int] = None,
        kv_pool_blocks: Optional[int] = None,
        admit_batch: Optional[int] = None,
        allow_divergent_spec: bool = False,
        admit_min_fill: int = 1,
        admit_max_wait_s: float = 0.05,
        admit_reorder: bool = False,
        admit_reorder_age_s: float = 0.5,
        mesh=None,
    ):
        import dataclasses as _dc

        self.mesh = mesh
        if mesh is not None:
            # tensor/data-parallel serving: params are committed with the
            # training-identical Megatron/ZeRO shardings
            # (parallel/mesh.py) and every server program inherits its
            # input shardings — GSPMD inserts the wo/w_down all-reduces
            # and shards the KV cache over heads by propagation from the
            # column-parallel wk/wv, exactly as parallel/serving.py's
            # one-shot ShardedGenerator. Pallas kernels cannot be
            # partitioned by GSPMD, so mesh serving pins the XLA
            # attention/decode paths (same policy as ShardedGenerator).
            cfg = _dc.replace(
                cfg, use_flash_decode=False, use_pallas_attention=False
            )
            from llark_tpu.parallel.mesh import (
                adapt_specs_to_params,
                param_partition_specs,
                param_shardings,
            )

            pspecs = adapt_specs_to_params(param_partition_specs(cfg), params)
            params = jax.tree.map(
                jax.device_put, params, param_shardings(mesh, pspecs)
            )
            if draft_cfg is not None and draft_params is not None:
                # the draft runs inside the same GSPMD programs: its
                # Pallas paths must be pinned off exactly like the target's
                draft_cfg = _dc.replace(
                    draft_cfg,
                    use_flash_decode=False,
                    use_pallas_attention=False,
                )
                d_pspecs = adapt_specs_to_params(
                    param_partition_specs(draft_cfg), draft_params
                )
                draft_params = jax.tree.map(
                    jax.device_put, draft_params,
                    param_shardings(mesh, d_pspecs),
                )
        if cfg.use_flash_decode is None:
            # serving regime: the cache is provisioned for max context and
            # live length is usually well below it -- the Pallas flash-
            # decode kernel's live-only reads win here (PERFORMANCE.md
            # round-2 crossover: live < ~0.55x padded)
            cfg = _dc.replace(cfg, use_flash_decode=True)
        self.cfg = cfg
        self.params = params
        self.audio_patch_id = audio_patch_id
        self.gen_cfg = gen_cfg or GenerationConfig()
        self.max_batch = max_batch
        # admission prefill batch: the transient-HBM knob. The bucket-sized
        # admission cache ([L, admit_batch, Hkv, bucket, D]) coexists with
        # weights + the persistent cache/pool while requests splice in, so
        # at high slot counts a full max_batch-row prefill can tip the chip
        # over (measured: 7B int8, 12 slots x 1024-bucket admission OOMs
        # where 8 fits). Smaller admit_batch trades burst-admission latency
        # (ceil(burst / admit_batch) prefill dispatches) for peak memory.
        self.admit_batch = min(admit_batch or max_batch, max_batch)
        # admission hysteresis (open-loop scheduling): every admission
        # prefill dispatch is padded to admit_batch rows and stalls decode
        # for all live slots, so under trickling arrivals admitting each
        # request the instant a slot frees pays a full prefill wave per
        # request. With admit_min_fill > 1 the server waits until that many
        # requests are queued (or the oldest has waited admit_max_wait_s,
        # or no rows are active — never idle the chip) before prefilling,
        # amortizing the wave across arrivals at a bounded TTFT cost.
        self.admit_min_fill = max(1, int(admit_min_fill))
        self.admit_max_wait_s = float(admit_max_wait_s)
        # bounded admission reordering (mixed-length traffic): each wave is
        # ONE bucket, so under strict FIFO a short request behind a
        # long-bucket head waits that whole wave (head-of-line blocking).
        # With admit_reorder the largest queued same-bucket group wins the
        # wave instead — bounded by admit_reorder_age_s: once the head
        # request has waited that long its bucket is forced, so no bucket
        # starves under a flood of the others.
        self.admit_reorder = bool(admit_reorder)
        self.admit_reorder_age_s = float(admit_reorder_age_s)
        self.max_cache_len = max_cache_len
        self.prompt_buckets = tuple(sorted(prompt_buckets))
        self.max_audio_frames = max_audio_frames
        self.decode_chunk = decode_chunk
        self.tokenizer = tokenizer

        # prefix caching: every LLark request opens with the same
        # conversation header (conv_v1_2, reference
        # m2t/llava/conversation.py:237-271), so its KV is computed once
        # and admission prefills only the per-request suffix. Two regimes:
        #   dense — a b=1 prefix cache broadcast into every admission cache
        #     (make_prefix_cache_fn / make_suffix_prefill_fn);
        #   paged (kv_block_size set) — the block-aligned HEAD of the prefix
        #     fills shared pool blocks every slot's table points at (the
        #     sub-block remainder folds into each request's suffix), riding
        #     the direct-to-pool chunked-prefill path.
        self._prefix_ids: Optional[np.ndarray] = None
        if shared_prefix_ids is not None:
            if prefill_chunk is not None and kv_block_size is None:
                raise ValueError(
                    "prefix caching and chunked prefill are mutually "
                    "exclusive (the suffix IS the short part)"
                )
            pids = np.asarray(shared_prefix_ids, np.int32).reshape(-1)
            if pids.size < 1:
                raise ValueError("shared_prefix_ids must be non-empty")
            if np.any(pids == audio_patch_id):
                raise ValueError(
                    "the shared prefix must be text-only (audio patch "
                    "tokens belong to the per-request suffix)"
                )
            self._prefix_ids = pids
            if kv_block_size is not None:
                if prefill_chunk is None:
                    raise ValueError(
                        "paged prefix caching rides the direct-to-pool "
                        "chunked admission path: set prefill_chunk (a "
                        "suffix-bucket-sized chunk gives one-shot behavior)"
                    )
                if pids.size < kv_block_size:
                    raise ValueError(
                        f"shared prefix ({pids.size} tokens) is shorter "
                        f"than one KV block ({kv_block_size}): no full "
                        "block to share — drop prefix caching or shrink "
                        "kv_block_size"
                    )
                # fused-draft speculation over a paged prefix: the TARGET
                # prefix lives in shared pool blocks, but the draft cache
                # is dense, so draft admission is prefix-SEEDED exactly
                # like dense-prefix mode (over the block-aligned head; the
                # sub-block remainder rides each request's suffix)
                self._prefix_cache = None
                self._d_prefix_cache = None
                self._seed_by_total: Dict[Any, Any] = {}
            else:
                from llark_tpu.generate import make_suffix_prefill_fn

                self._suffix_prefill = jax.jit(
                    make_suffix_prefill_fn(cfg, audio_patch_id)
                )
                self._prefix_cache = None  # built lazily on first admission
                self._d_prefix_cache = None
                self._seed_by_total: Dict[Any, Any] = {}
        # full length for prompt matching; the CACHED length (everything
        # admission may skip) is block-aligned in paged mode
        self._prefix_match_len = (
            0 if self._prefix_ids is None else int(self._prefix_ids.size)
        )
        if self._prefix_ids is not None and kv_block_size is not None:
            self._prefix_len = (
                self._prefix_match_len // kv_block_size
            ) * kv_block_size
        else:
            self._prefix_len = self._prefix_match_len
        # drop impossible bucket geometry up front: every admission table /
        # admission cache is sized bucket (+ chunk padding) past the cached
        # prefix, so a bucket that cannot fit would otherwise surface as an
        # opaque numpy broadcast error at the first admission (killing an
        # OnlineEngine's engine thread under queued requests). Oversized
        # buckets are FILTERED, not fatal: a config like buckets=(128, 512)
        # with a 256-token cache serves every <=128-token prompt correctly
        # (the 512 bucket is simply never selectable), so a fail-fast guard
        # must not reject it — only a geometry where NO bucket fits raises.
        feasible = []
        for b in self.prompt_buckets:
            pad = (-b) % prefill_chunk if prefill_chunk else 0
            if self._prefix_len + b + pad > max_cache_len:
                log.warning(
                    "dropping prompt bucket %d%s: cannot fit max_cache_len "
                    "%d%s — prompts longer than the largest remaining "
                    "bucket will be rejected at submission",
                    b,
                    f" (padded to {b + pad} by prefill_chunk)" if pad else "",
                    max_cache_len,
                    (
                        f" after the {self._prefix_len}-token cached prefix"
                        if self._prefix_len
                        else ""
                    ),
                )
                continue
            if kv_block_size is not None and prefill_chunk is not None and b % prefill_chunk:
                raise ValueError(
                    f"paged chunked prefill needs every prompt bucket to be "
                    f"a multiple of prefill_chunk ({prefill_chunk}); got {b}"
                )
            feasible.append(b)
        if not feasible:
            raise ValueError(
                f"no prompt bucket in {self.prompt_buckets} fits "
                f"max_cache_len {max_cache_len}"
                + (
                    f" after the {self._prefix_len}-token cached prefix"
                    if self._prefix_len
                    else ""
                )
                + (
                    f" with prefill_chunk {prefill_chunk} padding"
                    if prefill_chunk
                    else ""
                )
                + ": shrink the buckets or enlarge the cache"
            )
        self.prompt_buckets = tuple(feasible)

        # one prefill program per prompt bucket, with a BUCKET-sized cache:
        # admission only needs the prompt positions (the row splice into the
        # persistent cache writes those; decode overwrites past plen), and a
        # max_cache_len x max_batch admission cache would duplicate the
        # persistent cache's full HBM footprint (measured OOM at 8 slots x
        # 2048 int8 on one chip)
        self._prefill_by_bucket: Dict[int, Any] = {}
        # chunked admission: interleave prompt-chunk forwards with decode
        # rounds so live slots keep emitting during long-prompt prefills
        self.prefill_chunk = prefill_chunk
        if prefill_chunk is not None:
            if prefill_chunk < 1:
                raise ValueError("prefill_chunk must be >= 1")
            from llark_tpu.models.fusion import build_inputs_embeds

            self._embed = jax.jit(
                lambda params, ids, audio, fcnt: build_inputs_embeds(
                    cfg, params, ids, audio, audio_patch_id, fcnt
                )
            )
            # donate the threaded admission cache: without it each chunk
            # step holds input+output copies of the bucket-sized cache
            # (~1.6 GB at 7B int8, 6-row x 1024 admission) — measured as
            # the transient that tipped 12-slot paged serving over HBM
            self._prefill_chunk = jax.jit(
                make_prefill_chunk_fn(cfg), donate_argnums=(3,)
            )
            # pos_offset: with paged prefix caching the chunked embeds hold
            # only suffixes, whose absolute positions start at the block-
            # aligned shared-prefix length (zero everywhere else — dense
            # prefix mode excludes chunking)
            self._prefill_last = jax.jit(
                make_prefill_last_fn(cfg, pos_offset=self._prefix_len),
                donate_argnums=(3,),
            )
        self._decode_n = jax.jit(
            make_multistep_decode_fn(cfg, self.gen_cfg, decode_chunk),
            donate_argnums=(2,),
        )
        # adaptive decode rounds: the low-load TTFT floor is the
        # UNPREEMPTIBLE in-flight decode round — an arrival that lands
        # mid-round waits it out (up to decode_chunk tokens x all live
        # slots) before admission can even see it (~0.6 s at chunk 16
        # even at 10% utilization, PERFORMANCE.md "TTFT anatomy"). With
        # decode_chunk_drain set, rounds dispatched while a slot is FREE
        # run this shorter chunk instead: free capacity means a new
        # arrival could be admitted immediately, so the engine keeps its
        # unpreemptible window short (latency mode) and switches back to
        # full rounds when every slot is busy (throughput mode — nothing
        # to admit into, so long rounds only save dispatch syncs). A
        # second compiled program; identical per-token math, so tokens
        # are unchanged (greedy-exact in fp32).
        #
        # drain_max_active bounds the trigger AWAY from saturation
        # (default: half the slots). A bare free-slot trigger is bistable
        # near full load — the drain rounds' own dispatch cost slows
        # retirement just enough to keep one slot free, locking the
        # engine in drain mode below its full-round capacity (measured:
        # drain 8 at 0.9 QPS fell to 0.56 achieved with 25 s TTFTs,
        # logs_r5/r5_drain_8.log). Requiring at-most-half occupancy keeps
        # drain a low-load latency mode only.
        self.decode_chunk_drain = decode_chunk_drain
        self._decode_n_drain = None
        if decode_chunk_drain is not None:
            self.drain_max_active = (
                max_batch // 2 if drain_max_active is None
                else int(drain_max_active)
            )
            if not 1 <= decode_chunk_drain <= decode_chunk:
                raise ValueError(
                    f"decode_chunk_drain {decode_chunk_drain} must be in "
                    f"[1, decode_chunk={decode_chunk}] (capacity headroom "
                    "is provisioned for the full chunk)"
                )
            if spec_mode is not None or draft_cfg is not None:
                # speculative rounds replace plain decode rounds entirely
                # (_decode_round dispatches to _spec_round/_hostspec_round
                # first), so the drain program would never run — harmless,
                # but say so instead of silently ignoring the knob
                log.warning(
                    "decode_chunk_drain is inert under speculation: "
                    "propose/verify rounds replace plain decode rounds, "
                    "so the short drain program never dispatches"
                )
            self._decode_n_drain = jax.jit(
                make_multistep_decode_fn(
                    cfg, self.gen_cfg, decode_chunk_drain
                ),
                donate_argnums=(2,),
            )
        self._insert = jax.jit(self._insert_row, donate_argnums=(0,))

        # speculative serving: a draft model turns each decode round into
        # spec_rounds fused propose->verify->accept rounds on-device
        # (inference/speculative.py make_fused_rounds_fn is batched with
        # per-row ragged positions, so it drops into the slot engine)
        if (draft_cfg is None) != (draft_params is None):
            raise ValueError("draft_cfg and draft_params must be given together")
        self.draft_cfg = draft_cfg
        self.draft_params = draft_params
        self.gamma = int(gamma)
        self.spec_rounds = int(spec_rounds)
        if draft_cfg is not None:
            from llark_tpu.inference.speculative import make_fused_rounds_fn

            if draft_cfg.mm_hidden_size != cfg.mm_hidden_size:
                # admission feeds ONE audio buffer to both prefills
                raise ValueError(
                    f"draft mm_hidden_size {draft_cfg.mm_hidden_size} != "
                    f"target {cfg.mm_hidden_size}"
                )
            if draft_cfg.vocab_size != cfg.vocab_size:
                raise ValueError(
                    f"draft vocab {draft_cfg.vocab_size} != target "
                    f"{cfg.vocab_size} (proposals are target-vocab ids)"
                )

            if draft_cfg.use_flash_decode is None:
                import dataclasses as _dc

                draft_cfg = _dc.replace(draft_cfg, use_flash_decode=True)
                self.draft_cfg = draft_cfg
            # device rows may overshoot while the host decides to stop them;
            # clamping inside the fused program keeps writes in bounds
            self._spec_max_pos = max_cache_len - 1 - self.gamma
            self._d_prefill = jax.jit(
                make_prefill_fn(draft_cfg, audio_patch_id, max_cache_len)
            )
            if self._prefix_ids is not None:
                from llark_tpu.generate import make_suffix_prefill_fn

                self._d_suffix_prefill = jax.jit(
                    make_suffix_prefill_fn(draft_cfg, audio_patch_id)
                )
            self._spec = jax.jit(
                make_fused_rounds_fn(
                    cfg, draft_cfg, self.gen_cfg, self.gamma,
                    self.spec_rounds, self._spec_max_pos,
                ),
                donate_argnums=(2, 3),
            )
            self._d_cache = None
            self._prev_tok = np.zeros((max_batch,), np.int32)

        # draft-FREE speculation (spec_mode="ngram"): proposals come from
        # the host (prompt-lookup by default, or any `spec_proposer(history,
        # gamma) -> [gamma] ids` — benches inject controlled-acceptance
        # oracles through it), verified by ONE target forward over
        # [last, d_1..d_gamma] per round (inference/speculative.py
        # _make_verify_fn batched with ragged positions). Unlike the fused
        # draft path this syncs the host every round — proposals need the
        # newly accepted tokens — so each round costs one dispatch + one
        # transfer for up to gamma+1 tokens per slot.
        self.spec_mode = spec_mode
        self.spec_proposer = spec_proposer
        self.ngram_max_k = int(ngram_max_k)
        self.spec_accepted = 0  # host-spec acceptance counters (stats())
        self.spec_proposed = 0
        # BENCH-ONLY: override the verify result with a host-drawn
        # per-proposal acceptance of this probability. Device work is
        # unchanged (same verify forward, same writes); only the accept
        # decision is forced, so throughput-vs-acceptance curves can be
        # measured with random weights, whose near-tie argmaxes flip
        # between the decode and verify graph shapes in bf16 and crush
        # natural acceptance. Output tokens are NOT meaningful under this.
        self.spec_force_accept = spec_force_accept
        self._force_rng = np.random.RandomState(1234)
        if spec_mode is not None or draft_cfg is not None:
            # bf16 speculation can silently emit different text than plain
            # decode (verify vs decode graph shapes round differently) —
            # require an explicit opt-in below fp32. A bench that forces
            # acceptance (spec_force_accept) has already declared its
            # outputs meaningless, so it counts as informed consent.
            from llark_tpu.inference.speculative import check_spec_dtype

            check_spec_dtype(
                cfg, allow_divergent_spec or spec_force_accept is not None
            )
        if spec_mode is not None:
            if spec_mode != "ngram":
                raise ValueError(f"unknown spec_mode {spec_mode!r}")
            if draft_cfg is not None:
                raise ValueError(
                    "spec_mode='ngram' and a draft model are mutually "
                    "exclusive (pick one proposal source)"
                )
            from llark_tpu.inference.speculative import (
                _make_verify_fn,
                ngram_propose,
            )

            self._hostspec_verify = jax.jit(
                _make_verify_fn(cfg, self.gen_cfg, self.gamma),
                donate_argnums=(3,),
            )
            if spec_proposer is None:
                self.spec_proposer = lambda hist, g: ngram_propose(
                    hist, g, self.ngram_max_k
                )

        # paged KV (kv_block_size set): the persistent cache is a physical
        # block POOL + per-slot block tables instead of max_batch dense
        # max_cache_len rows — HBM scales with kv_pool_blocks, so the same
        # memory admits more live slots (inference/paged.py). Tables are
        # host-owned; a dirty flag refreshes the device copy (tiny int32
        # [B, max_blocks]) before the next dispatch.
        self.kv_block_size = kv_block_size
        self.paged = kv_block_size is not None
        if self.paged:
            if max_cache_len % kv_block_size:
                raise ValueError(
                    f"max_cache_len {max_cache_len} must be a multiple of "
                    f"kv_block_size {kv_block_size}"
                )
            if kv_block_size % 8:
                raise ValueError(
                    "kv_block_size must be a multiple of 8 (Mosaic "
                    "last-two-dims tiling rule for the pool blocks)"
                )
            # the decode kernel double-buffers whole K+V pool blocks in
            # VMEM and cannot halve them (block_k == physical block size):
            # reject over-budget sizes here instead of at the first decode
            # dispatch (opaque Mosaic compile error / VMEM exhaustion)
            from llark_tpu.ops.decode_attention import max_paged_block_size

            itemsize = 1 if cfg.kv_cache_quant else jnp.dtype(cfg.dtype).itemsize
            cap = max_paged_block_size(cfg.num_kv_heads, cfg.head_dim, itemsize)
            if kv_block_size > cap:
                raise ValueError(
                    f"kv_block_size {kv_block_size} exceeds the VMEM-safe "
                    f"maximum {cap} for {cfg.num_kv_heads} KV heads x "
                    f"head_dim {cfg.head_dim} ({'int8' if cfg.kv_cache_quant else cfg.dtype} "
                    f"cache): the paged decode kernel double-buffers whole "
                    f"pool blocks and cannot subdivide them"
                )
            if (
                spec_mode is not None or draft_cfg is not None
            ) and gamma + 1 > kv_block_size:
                raise ValueError("gamma+1 must fit in one KV block")
            from llark_tpu.inference.paged import BlockAllocator

            self._max_blocks = max_cache_len // kv_block_size
            if kv_pool_blocks is None:
                # conservative default: full dense capacity (no HBM saving;
                # callers size the pool down to their live-token budget)
                kv_pool_blocks = max_batch + max_batch * self._max_blocks
            self.kv_pool_blocks = kv_pool_blocks
            self._allocator = BlockAllocator(kv_pool_blocks, max_batch)
            self._host_tables = np.broadcast_to(
                np.arange(max_batch, dtype=np.int32)[:, None],
                (max_batch, self._max_blocks),
            ).copy()
            self._tables_dirty = True
            self._slot_blocks: List[List[int]] = [[] for _ in range(max_batch)]
            self._paged_insert_by_n: Dict[int, Any] = {}
            self._prefill_chunk_paged = None
            # paged prefix caching: pool blocks holding the block-aligned
            # shared-prefix KV, read by every slot's table, never freed
            self._shared_block_ids: Optional[List[int]] = None

        # persistent batched cache, built lazily from the first prefill's
        # row cache structure (avoids duplicating init_kv_cache shapes here)
        self._cache = None
        # host-side slot state
        self._slot_req: List[Optional[Request]] = [None] * max_batch
        self._write_pos = np.zeros((max_batch,), np.int32)
        self._tokens_in_flight = np.zeros((max_batch,), np.int32)  # pending device col
        self._queue: List[Request] = []
        self._rng = jax.random.PRNGKey(0)
        # exclusive-driver guard: an OnlineEngine claims the server on
        # start(); serve() refuses to run concurrently — two drivers would
        # race _decode_round over the DONATED kv-cache buffer
        self.driver = None

    # ------------------------------------------------------------------
    @staticmethod
    def _insert_row(batch_cache, new_cache, src_row, dst_slot):
        """Splice row `src_row` of a freshly-prefilled cache into slot
        `dst_slot` of the persistent batched cache."""

        def upd(b, r):
            if b.ndim == 0:  # scalar index — decode uses per-row positions
                return b
            # cache leaves are [L, B, ...]
            row = jax.lax.dynamic_slice_in_dim(r, src_row, 1, axis=1)
            start = (0, dst_slot) + (0,) * (b.ndim - 2)
            return jax.lax.dynamic_update_slice(b, row.astype(b.dtype), start)

        return jax.tree.map(upd, batch_cache, new_cache)

    def _suffix_len(self, req: Request) -> int:
        """Tokens the admission prefill must actually compute (the whole
        prompt without prefix caching; the per-request suffix with it —
        which in paged mode includes the prefix's sub-block remainder)."""
        return len(req.input_ids) - self._prefix_len

    def _check_prefix(self, req: Request) -> Optional[str]:
        """None if the request is admissible under prefix caching, else a
        rejection message."""
        if self._prefix_ids is None:
            return None
        ids = np.asarray(req.input_ids)
        p = self._prefix_match_len
        if len(ids) <= p or not np.array_equal(ids[:p], self._prefix_ids):
            return (
                f"prompt must start with the {p}-token shared prefix and "
                "carry at least one suffix token (prefix-caching server)"
            )
        return None

    def _ensure_prefix_caches(self) -> None:
        """Lazily run the one-time b=1 prefix prefill (target and draft).

        Paged mode: the TARGET prefix lives in shared pool blocks
        (_ensure_paged_prefix), so only the dense draft cache needs a
        seed — over the block-aligned head, whose length is the cache
        index the suffix prefill offsets positions by."""
        if self._prefix_ids is None:
            return
        from llark_tpu.generate import make_prefix_cache_fn

        ids1 = jnp.asarray(self._prefix_ids[None, : self._prefix_len])
        if not self.paged and self._prefix_cache is None:
            self._prefix_cache = jax.jit(make_prefix_cache_fn(self.cfg))(
                self.params, ids1
            )
        if self.draft_cfg is not None and self._d_prefix_cache is None:
            self._d_prefix_cache = jax.jit(
                make_prefix_cache_fn(self.draft_cfg)
            )(self.draft_params, ids1)

    def _seeded_admission_cache(self, which: str, total: int):
        """Zeros admission cache of length `total` with the prefix KV
        broadcast into every row (cache index = prefix length). Jitted per
        (model, total) shape."""
        if total > self.max_cache_len:
            raise ValueError(
                f"prefix ({self._prefix_len}) + bucket "
                f"({total - self._prefix_len}) exceeds max_cache_len "
                f"{self.max_cache_len}"
            )
        key = (which, total)
        fn = self._seed_by_total.get(key)
        if fn is None:
            cfg = self.cfg if which == "t" else self.draft_cfg
            k = self.admit_batch

            def seed(prefix_cache):
                from llark_tpu.models.decoder import init_kv_cache

                empty = init_kv_cache(cfg, k, total)

                def put(z, p):
                    if z.ndim == 0:  # scalar index: == prefix length
                        return p
                    rep = jnp.broadcast_to(p, (p.shape[0], k) + p.shape[2:])
                    return jax.lax.dynamic_update_slice(
                        z, rep.astype(z.dtype), (0,) * z.ndim
                    )

                return jax.tree.map(put, empty, prefix_cache)

            fn = jax.jit(seed)
            self._seed_by_total[key] = fn
        pc = self._prefix_cache if which == "t" else self._d_prefix_cache
        return fn(pc)

    def _ensure_pool_cache(self) -> None:
        """Lazily build the paged persistent cache (block pool + tables +
        per-row positions). One home for the init so every paged entry point
        (prefix fill, direct-to-pool admission, post-insert admission) stays
        on the same leaf set."""
        if self._cache is None:
            from llark_tpu.models.decoder import init_paged_kv_cache

            self._cache = init_paged_kv_cache(
                self.cfg, self.max_batch, self.kv_pool_blocks,
                self.kv_block_size, self._max_blocks,
            )

    def _paged_chunk_fn(self):
        """Lazily jit the direct-to-pool chunk program (donating the pool)."""
        if self._prefill_chunk_paged is None:
            from llark_tpu.generate import make_paged_prefill_chunk_fn

            self._prefill_chunk_paged = jax.jit(
                make_paged_prefill_chunk_fn(self.cfg),
                donate_argnums=(3,),
            )
        return self._prefill_chunk_paged

    def _pool_tmp(self, tables):
        """(pool_keys, tmp) shuttle for the direct-to-pool chunk program:
        the pool leaves of the persistent cache plus a fresh index and the
        given block tables. Callers copy tmp[pool_keys] back after each
        dispatch so interleaved decode rounds see every write."""
        pool_keys = [
            kk for kk in ("k", "v", "k_scale", "v_scale") if kk in self._cache
        ]
        tmp = {kk: self._cache[kk] for kk in pool_keys}
        tmp["index"] = jnp.zeros((), jnp.int32)
        tmp["block_tables"] = jnp.asarray(tables)
        return pool_keys, tmp

    def _ensure_paged_prefix(self) -> None:
        """Lazily fill the shared-prefix pool blocks (paged prefix caching):
        allocate ceil-free blocks for the block-aligned prefix head, run ONE
        direct-to-pool chunk forward over its embeddings, and pin the block
        ids for every admission table. Runs once per server lifetime."""
        if (
            not self.paged
            or self._prefix_ids is None
            or self._shared_block_ids is not None
        ):
            return
        self._ensure_pool_cache()
        n_shared = self._prefix_len // self.kv_block_size
        blocks = self._allocator.alloc(n_shared)
        if blocks is None:
            raise RuntimeError(
                f"pool of {self.kv_pool_blocks} blocks cannot hold the "
                f"{n_shared}-block shared prefix"
            )
        from llark_tpu.models.decoder import embed_tokens

        # one block-aligned chunk covering the whole cached prefix (a
        # one-time program; its transient is a single [1, P', H] forward).
        # If the embed/chunk forward raises after the alloc succeeded,
        # return the blocks: _shared_block_ids stays None, so an
        # OnlineEngine loop would retry every round and each retry would
        # otherwise leak n_shared blocks until the pool was exhausted
        # (mirrors _admit's pending_blocks handling; ADVICE r4 #1).
        try:
            ids1 = jnp.asarray(self._prefix_ids[None, : self._prefix_len])
            embeds = jax.jit(
                lambda p, i: embed_tokens(self.cfg, p, i)
            )(self.params, ids1)
            pool_keys, tmp = self._pool_tmp(
                np.asarray(blocks, np.int32)[None, :]
            )
            tmp = self._paged_chunk_fn()(
                self.params, embeds,
                jnp.full((1,), self._prefix_len, jnp.int32),
                tmp, jnp.int32(0),
            )
        except Exception:
            self._allocator.free(blocks)
            raise
        for kk in pool_keys:
            self._cache[kk] = tmp[kk]
        self._shared_block_ids = blocks

    def _headroom(self) -> int:
        """Cache positions a live row may write past its stop point before
        the host truncates it (one source for serve()'s capacity check and
        the paged block budget)."""
        if self.draft_cfg is not None:
            return 2 * self.spec_rounds * (self.gamma + 1) + self.gamma + 1
        if self.spec_mode is not None:
            return 2 * (self.gamma + 1)
        return self.decode_chunk

    def _block_budget(self, suffix_len: int, bucket: int) -> int:
        """PRIVATE physical blocks a request needs for its whole lifetime:
        the admission insert covers the full bucket span; decode then writes
        up to max_new + headroom past the prompt. With paged prefix caching
        the span is measured from the block-aligned shared-prefix boundary
        (the shared blocks are not counted — they are pool-wide)."""
        span = max(bucket, suffix_len + self.gen_cfg.max_new_tokens + self._headroom())
        cap = self.max_cache_len - self._prefix_len
        return -(-min(span, cap) // self.kv_block_size)

    def _refresh_tables(self) -> None:
        if self.paged and self._tables_dirty and self._cache is not None:
            self._cache["block_tables"] = jnp.asarray(self._host_tables)
            self._tables_dirty = False

    def _bucket(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"prompt length {n} exceeds the largest bucket {self.prompt_buckets[-1]}"
        )

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _admit_ready(self) -> bool:
        """Admission hysteresis: True when an admission wave should fire
        now. Always fires when nothing is decoding (waiting would idle the
        chip) or when enough requests queued to fill the wave; otherwise
        holds until the oldest queued request has waited admit_max_wait_s
        so a trickle of arrivals coalesces into one padded prefill."""
        if self.admit_min_fill <= 1:
            return True
        if not self._active():
            return True
        want = min(self.admit_min_fill, self.admit_batch, len(self._free_slots()))
        if len(self._queue) >= want:
            return True
        oldest = min(r.submitted_at for r in self._queue)
        return (time.time() - oldest) >= self.admit_max_wait_s

    def _select_admit_group(self, width: int):
        """(bucket, members) for this admission wave, members FIFO-ordered.

        Default (strict FIFO): the head request's bucket, consecutive
        same-bucket head-of-queue members only.

        admit_reorder (bounded reordering): the LARGEST queued same-bucket
        group wins the wave (ties: the group whose first member is
        oldest), scanning past bucket mismatches — unless the head
        request has already waited admit_reorder_age_s, in which case its
        bucket is forced (the anti-starvation bound). Requests that fail
        the prefix check or have no feasible bucket are skipped here and
        fail individually when they reach the head."""
        q = self._queue
        if (
            self.admit_reorder
            and len(q) > 1
            and (time.time() - q[0].submitted_at) < self.admit_reorder_age_s
        ):
            groups: Dict[int, List[Request]] = {}
            for r in q:
                if self._check_prefix(r) is not None:
                    continue
                try:
                    groups.setdefault(
                        self._bucket(self._suffix_len(r)), []
                    ).append(r)
                except ValueError:
                    continue  # oversize: fails at head, not here
            if groups:
                bucket, members = max(
                    groups.items(),
                    key=lambda kv: (
                        min(len(kv[1]), width),
                        -kv[1][0].submitted_at,
                    ),
                )
                return bucket, members[:width]
        bucket = self._bucket(self._suffix_len(q[0]))
        members: List[Request] = []
        for r in q:
            if (
                len(members) >= width
                or self._check_prefix(r) is not None
                or self._bucket(self._suffix_len(r)) != bucket
            ):
                break
            members.append(r)
        return bucket, members

    def _admit(self) -> None:
        """Prefill queued requests into free slots. Same-bucket requests at
        the head of the queue are prefilled together in ONE batched call
        (a burst of k arrivals costs one prefill, not k); see
        _select_admit_group for the mixed-bucket reordering policy."""
        self._ensure_prefix_caches()
        self._ensure_paged_prefix()
        while self._queue and self._free_slots() and self._admit_ready():
            # prefix-caching servers reject prompts that don't open with
            # the shared prefix (fail the request, not the batch)
            while self._queue:
                err = self._check_prefix(self._queue[0])
                if err is None:
                    break
                req = self._queue.pop(0)
                req.error = err
                req.done = True
                req.finished_at = time.time()
            if not self._queue:
                break
            slots = self._free_slots()
            head_bucket, candidates = self._select_admit_group(
                min(len(slots), self.admit_batch)
            )
            group: List[Request] = []
            pending_blocks: List[List[int]] = []
            for req in candidates:
                if self.paged:
                    # admission is gated by pool capacity, not just free
                    # slots: a request that can't get its blocks waits in
                    # the queue until retirements free some
                    blocks = self._allocator.alloc(
                        self._block_budget(self._suffix_len(req), head_bucket)
                    )
                    if blocks is None:
                        break
                    pending_blocks.append(blocks)
                group.append(req)
            if not group:
                break  # pool exhausted: decode on, admit after retirements
            admitted = set(map(id, group))
            self._queue = [r for r in self._queue if id(r) not in admitted]
            # everything that can raise (jit compile, XLA OOM,
            # alignment ValueError) runs before any block is committed to a
            # slot: on failure, return the allocated blocks to the pool so a
            # failed admission cannot permanently shrink it
            try:
                # fixed admission batch (pad with plen=1 dummies): one prefill
                # program per bucket, independent of how many requests arrived
                k = self.admit_batch
                ids = np.zeros((k, head_bucket), np.int32)
                plens = np.ones((k,), np.int32)
                audio = np.zeros((k, self.max_audio_frames, self.cfg.mm_hidden_size), np.float32)
                fcnt = np.zeros((k,), np.int32)
                for j, req in enumerate(group):
                    row = np.asarray(req.input_ids, np.int32)[self._prefix_len:]
                    n = len(row)
                    ids[j, :n] = row
                    plens[j] = n
                    if req.audio_encoding is not None:
                        t = min(req.audio_encoding.shape[0], self.max_audio_frames)
                        audio[j, :t] = req.audio_encoding[:t]
                        fcnt[j] = t
                if self._prefix_ids is not None and not self.paged:
                    cache0 = self._seeded_admission_cache(
                        "t", self._prefix_len + head_bucket
                    )
                    logits, new_cache = self._suffix_prefill(
                        self.params, jnp.asarray(ids), jnp.asarray(plens),
                        jnp.asarray(audio), jnp.asarray(fcnt), cache0,
                    )
                elif self.prefill_chunk is not None:
                    admit_tables = None
                    if self.paged:
                        # direct-to-pool prefill: hand the chunk programs each
                        # admitted row's block span (pad rows -> their own
                        # parking block); requires chunk-aligned buckets so the
                        # padded span never outruns the allocated budget
                        self._ensure_pool_cache()
                        # with paged prefix caching, every row's table leads
                        # with the shared-prefix blocks so suffix queries can
                        # attend them; suffix writes land past the boundary
                        n_shared = self._prefix_len // self.kv_block_size
                        span = n_shared + head_bucket // self.kv_block_size
                        admit_tables = np.empty((k, span), np.int32)
                        for j in range(k):
                            if j < len(group):
                                if n_shared:
                                    admit_tables[j, :n_shared] = self._shared_block_ids
                                admit_tables[j, n_shared:] = pending_blocks[j][
                                    : span - n_shared
                                ]
                            else:
                                admit_tables[j, :] = j  # parking block
                    logits, new_cache = self._chunked_prefill(
                        ids, plens, audio, fcnt, admit_tables
                    )
                else:
                    if head_bucket not in self._prefill_by_bucket:
                        self._prefill_by_bucket[head_bucket] = jax.jit(
                            make_prefill_fn(
                                self.cfg, self.audio_patch_id, head_bucket
                            )
                        )
                    logits, new_cache = self._prefill_by_bucket[head_bucket](
                        self.params, jnp.asarray(ids), jnp.asarray(plens),
                        jnp.asarray(audio), jnp.asarray(fcnt),
                    )
                self._rng, sub = jax.random.split(self._rng)
                from llark_tpu.generate import _sample

                firsts = np.asarray(jax.device_get(_sample(logits, self.gen_cfg, sub)))
                if self.draft_cfg is not None:
                    if self._prefix_ids is not None:
                        d_cache0 = self._seeded_admission_cache(
                            "d", self._prefix_len + head_bucket
                        )
                        _, d_new_cache = self._d_suffix_prefill(
                            self.draft_params, jnp.asarray(ids), jnp.asarray(plens),
                            jnp.asarray(audio), jnp.asarray(fcnt), d_cache0,
                        )
                    else:
                        _, d_new_cache = self._d_prefill(
                            self.draft_params, jnp.asarray(ids), jnp.asarray(plens),
                            jnp.asarray(audio), jnp.asarray(fcnt),
                        )
                    if self._d_cache is None:
                        from llark_tpu.models.decoder import init_kv_cache

                        self._d_cache = init_kv_cache(
                            self.draft_cfg, self.max_batch, self.max_cache_len
                        )
                if self._cache is None:
                    if self.paged:
                        self._ensure_pool_cache()
                    else:
                        # the persistent batched cache is FULL max_cache_len
                        # even though admission caches are bucket-sized
                        from llark_tpu.models.decoder import init_kv_cache

                        self._cache = init_kv_cache(
                            self.cfg, self.max_batch, self.max_cache_len
                        )
            except Exception:
                if self.paged:
                    for blocks in pending_blocks:
                        self._allocator.free(blocks)
                raise
            now = time.time()
            bucket_blocks = (
                -(-head_bucket // self.kv_block_size) if self.paged else 0
            )
            for j, req in enumerate(group):
                slot = slots[j]
                if self.paged:
                    blocks = pending_blocks[j]
                    self._slot_blocks[slot] = blocks  # private only: the
                    # shared-prefix blocks are pool-wide and never freed
                    ns = self._prefix_len // self.kv_block_size
                    self._host_tables[slot, :] = slot  # parking default
                    if ns:
                        self._host_tables[slot, :ns] = self._shared_block_ids
                    self._host_tables[slot, ns : ns + len(blocks)] = blocks
                    self._tables_dirty = True
                    if new_cache is None:
                        # direct-to-pool chunked prefill: the K/V already
                        # sit in this row's blocks — nothing to insert
                        pass
                    else:
                        insert = self._paged_insert_by_n.get(bucket_blocks)
                        if insert is None:
                            from llark_tpu.inference.paged import (
                                make_block_insert_fn,
                            )

                            insert = jax.jit(
                                make_block_insert_fn(
                                    self.kv_block_size, bucket_blocks
                                ),
                                donate_argnums=(0,),
                            )
                            self._paged_insert_by_n[bucket_blocks] = insert
                        self._cache = insert(
                            self._cache, new_cache, j,
                            jnp.asarray(blocks[:bucket_blocks], jnp.int32),
                        )
                else:
                    self._cache = self._insert(self._cache, new_cache, j, slot)
                if self.draft_cfg is not None:
                    self._d_cache = self._insert(self._d_cache, d_new_cache, j, slot)
                    self._prev_tok[slot] = int(ids[j, plens[j] - 1])
                req.first_token_at = now
                self._slot_req[slot] = req
                self._write_pos[slot] = self._prefix_len + plens[j]
                self._tokens_in_flight[slot] = int(firsts[j])
                if self._absorb(slot, int(firsts[j])):  # may already be EOS
                    self._finish(slot)

    def _chunked_prefill(self, ids, plens, audio, fcnt, admit_tables=None):
        """Prefill one admission group in `prefill_chunk`-token chunks,
        running a decode round for the live slots between chunks. With the
        bf16 cache this is token-identical to one-shot prefill (attention
        windows depend only on positions, so chunk boundaries are invisible
        to the math); with kv_cache_quant, chunks after the first attend the
        int8-quantized history while one-shot prefill attends full-precision
        in-flight K/V, so outputs agree only within quantization noise.

        The bucket is padded up to a chunk multiple so every chunk compiles
        the same program shape (compiles via the TPU tunnel cost minutes
        each); the pad region writes masked-then-overwritten cache slots,
        the same invariant padded one-shot prefill relies on."""
        from llark_tpu.models.decoder import init_kv_cache

        k, bucket = ids.shape
        embeds = self._embed(
            self.params, jnp.asarray(ids), jnp.asarray(audio), jnp.asarray(fcnt)
        )  # [k, bucket, H] fused (audio frames spliced in)
        pad = (-bucket) % self.prefill_chunk
        if self._prefix_len + bucket + pad > self.max_cache_len:
            raise ValueError(
                f"bucket {bucket} padded to {bucket + pad} (after a "
                f"{self._prefix_len}-token cached prefix) exceeds "
                f"max_cache_len {self.max_cache_len}; pick a prefill_chunk "
                "that divides the bucket or enlarge the cache"
            )
        padded = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0))) if pad else embeds
        plens_j = jnp.asarray(plens)
        if admit_tables is not None:
            # paged direct-to-pool prefill: each chunk writes its K/V
            # straight into the admitted rows' pool blocks (decoder
            # paged_chunk path) — NO bucket-sized admission cache and no
            # post-prefill block insert. This removes the transient that
            # capped paged slot counts (PERFORMANCE.md round 3). The pool
            # leaves shuttle between the chunk program and the persistent
            # cache dict so interleaved decode rounds see every write.
            if self.prefill_chunk % self.kv_block_size:
                raise ValueError(
                    f"paged chunked prefill needs prefill_chunk "
                    f"({self.prefill_chunk}) to be a multiple of "
                    f"kv_block_size ({self.kv_block_size})"
                )
            chunk_fn = self._paged_chunk_fn()
            pool_keys, tmp = self._pool_tmp(admit_tables)
            # with paged prefix caching the embeds hold only suffixes: their
            # absolute positions (chunk starts, live lengths) are offset by
            # the block-aligned cached-prefix length
            base = self._prefix_len
            plens_abs = plens_j + base if base else plens_j
            for c in range(0, bucket + pad, self.prefill_chunk):
                tmp = chunk_fn(
                    self.params,
                    jax.lax.dynamic_slice_in_dim(
                        padded, c, self.prefill_chunk, axis=1
                    ),
                    plens_abs,
                    tmp,
                    jnp.int32(base + c),
                )
                if c + self.prefill_chunk < bucket + pad:
                    # hand the pool back for the interleaved decode, then
                    # pick up its (donated-through) result
                    for kk in pool_keys:
                        self._cache[kk] = tmp[kk]
                    self._decode_round()
                    for kk in pool_keys:
                        tmp[kk] = self._cache[kk]
            logits, tmp = self._prefill_last(self.params, embeds, plens_j, tmp)
            for kk in pool_keys:
                self._cache[kk] = tmp[kk]
            return logits, None
        # bucket-sized admission cache (see __init__ note): the row splice
        # into the persistent cache only reads the prompt positions
        cache = init_kv_cache(self.cfg, k, bucket + pad)
        for c in range(0, bucket + pad, self.prefill_chunk):
            cache = self._prefill_chunk(
                self.params,
                jax.lax.dynamic_slice_in_dim(padded, c, self.prefill_chunk, axis=1),
                plens_j,
                cache,
            )
            if c + self.prefill_chunk < bucket + pad:
                self._decode_round()  # live slots keep emitting mid-prefill
        return self._prefill_last(self.params, embeds, plens_j, cache)

    def _absorb(self, slot: int, t: int) -> bool:
        """Mirror of Generator.generate's per-token absorb (generate.py):
        EOS tokens are dropped and stop the row; appended tokens check
        stop_text against an 8-token decoded TAIL only. Returns True when
        the row is finished."""
        req = self._slot_req[slot]
        gen = self.gen_cfg
        if gen.eos_token_id is not None and t == gen.eos_token_id:
            return True
        req.tokens.append(t)
        if gen.stop_text and self.tokenizer is not None:
            tail = self.tokenizer.decode(req.tokens[-8:])
            if gen.stop_text in tail:
                return True
        limit = gen.max_new_tokens
        if req.max_new_tokens is not None:
            limit = min(max(1, req.max_new_tokens), limit)
        return len(req.tokens) >= limit

    def _finish(self, slot: int) -> None:
        from llark_tpu.generate import Generator

        req = self._slot_req[slot]
        if self.gen_cfg.stop_text and self.tokenizer is not None:
            req.tokens = Generator._trim_stop(
                req.tokens, self.tokenizer, self.gen_cfg.stop_text
            )
        req.done = True
        req.finished_at = time.time()
        self._slot_req[slot] = None
        self._release_blocks(slot)

    def _release_blocks(self, slot: int) -> None:
        """Return a retired/aborted row's PRIVATE pool blocks and repoint
        its whole table at the parking block, so parked writes can never
        land in a block a future request now owns. Shared-prefix blocks
        are pool-wide and never freed. Also the abort path for engine
        drivers (OnlineEngine): skipping it on failure would leak the
        row's blocks for the server's lifetime."""
        if self.paged and self._slot_blocks[slot]:
            self._allocator.free(self._slot_blocks[slot])
            self._slot_blocks[slot] = []
            self._host_tables[slot, :] = slot
            self._tables_dirty = True

    def _active(self) -> List[int]:
        return [i for i, r in enumerate(self._slot_req) if r is not None]

    def _decode_round(self) -> None:
        """One chunked decode over all slots (inactive rows write to the
        last cache position, which is never attended by live rows)."""
        if self.draft_cfg is not None:
            return self._spec_round()
        if self.spec_mode is not None:
            return self._hostspec_round()
        active = self._active()
        if not active:
            return
        self._refresh_tables()
        # drain mode: at low occupancy an arrival could be admitted the
        # moment this round ends, so run the SHORT decode program to keep
        # the unpreemptible window small (see decode_chunk_drain in
        # __init__). Near/at full occupancy — full rounds, full sync
        # amortization (the occupancy gate prevents the near-saturation
        # bistability measured in logs_r5/r5_drain_8.log).
        chunk, decode_fn = self.decode_chunk, self._decode_n
        if (
            self._decode_n_drain is not None
            and len(active) <= self.drain_max_active
        ):
            chunk, decode_fn = self.decode_chunk_drain, self._decode_n_drain
        token = np.zeros((self.max_batch,), np.int32)
        # inactive rows park at the last `decode_chunk` cache positions,
        # which live rows can never attend (serve() caps prompt+max_new at
        # S - chunk; drain rounds write fewer tokens so the same base holds)
        pos = np.full((self.max_batch,), self.max_cache_len - self.decode_chunk, np.int32)
        for i in active:
            token[i] = self._tokens_in_flight[i]
            pos[i] = self._write_pos[i]
        self._rng, sub = jax.random.split(self._rng)
        toks, _logits, self._cache = decode_fn(
            self.params, jnp.asarray(token), self._cache, jnp.asarray(pos), sub
        )
        toks = np.asarray(jax.device_get(toks))  # [B, chunk]
        for i in active:
            for j in range(chunk):
                if self._absorb(i, int(toks[i, j])):
                    self._finish(i)
                    break
            else:
                # row still live: cache holds all chunk tokens
                self._write_pos[i] += chunk
                self._tokens_in_flight[i] = int(toks[i, -1])

    def _hostspec_round(self) -> None:
        """One draft-free speculative round: host proposals (prompt-lookup
        or injected oracle) verified by a single target forward over all
        slots. Emits 1..gamma+1 tokens per live slot per dispatch."""
        active = self._active()
        if not active:
            return
        self._refresh_tables()
        g = self.gamma
        tokens_in = np.zeros((self.max_batch, g + 1), np.int32)
        proposals = np.zeros((self.max_batch, g), np.int32)
        # parked rows write into the never-attended tail region
        pos = np.full((self.max_batch,), self.max_cache_len - (g + 1), np.int32)
        for i in active:
            req = self._slot_req[i]
            hist = list(map(int, req.input_ids)) + req.tokens
            props = self.spec_proposer(hist, g)
            proposals[i] = np.asarray(props, np.int32)
            tokens_in[i, 0] = self._tokens_in_flight[i]
            tokens_in[i, 1:] = proposals[i]
            pos[i] = self._write_pos[i]
        self._rng, sub = jax.random.split(self._rng)
        target_toks, n_emit, self._cache = self._hostspec_verify(
            self.params, jnp.asarray(tokens_in), jnp.asarray(proposals),
            self._cache, jnp.asarray(pos), sub,
        )
        # one host sync for both outputs (tunnel RTT, see _spec_round)
        target_toks, n_emit = (
            np.asarray(x) for x in jax.device_get((target_toks, n_emit))
        )
        for i in active:
            n = int(n_emit[i])
            if self.spec_force_accept is not None:
                n = 1
                while n <= g and (
                    self._force_rng.random_sample() < self.spec_force_accept
                ):
                    n += 1
            self.spec_accepted += n - 1
            self.spec_proposed += g
            finished = False
            for j in range(n):
                if self._absorb(i, int(target_toks[i, j])):
                    self._finish(i)
                    finished = True
                    break
            if not finished:
                self._write_pos[i] += n
                self._tokens_in_flight[i] = int(target_toks[i, n - 1])

    def _spec_round(self) -> None:
        """One fused speculative pass over all slots: spec_rounds complete
        propose->verify->accept->advance rounds in a single dispatch.
        Inactive rows park near the cache tail (their draft/target writes
        land in the never-attended tail region; the fused program's
        max_pos clamp keeps them in bounds)."""
        active = self._active()
        if not active:
            return
        self._refresh_tables()  # paged: fused rounds read/write via tables
        prev = np.zeros((self.max_batch,), np.int32)
        last = np.zeros((self.max_batch,), np.int32)
        pos = np.full(
            (self.max_batch,),
            self._spec_max_pos - self.spec_rounds * (self.gamma + 1),
            np.int32,
        )
        for i in active:
            prev[i] = self._prev_tok[i]
            last[i] = self._tokens_in_flight[i]
            pos[i] = self._write_pos[i]
        self._rng, sub = jax.random.split(self._rng)
        toks, n_emit, self._cache, self._d_cache, prev_o, last_o, pos_o, _ = (
            self._spec(
                self.params, self.draft_params, self._cache, self._d_cache,
                jnp.asarray(prev), jnp.asarray(last), jnp.asarray(pos), sub,
            )
        )
        # ONE host sync for all five outputs: separate device_gets pay the
        # tunnel round-trip each (measured: they alone put speculative
        # serving below plain serving)
        toks, n_emit, prev_o, last_o, pos_o = (
            np.asarray(x) for x in jax.device_get(
                (toks, n_emit, prev_o, last_o, pos_o)
            )
        )
        for i in active:
            finished = False
            for r in range(self.spec_rounds):
                for j in range(int(n_emit[i, r])):
                    if self._absorb(i, int(toks[i, r, j])):
                        self._finish(i)
                        finished = True
                        break
                if finished:
                    break
            if not finished:
                self._write_pos[i] = int(pos_o[i])
                self._prev_tok[i] = int(prev_o[i])
                self._tokens_in_flight[i] = int(last_o[i])

    # ------------------------------------------------------------------
    def serve(self, requests: List[Request]) -> List[Request]:
        """Run all requests to completion with continuous batching; returns
        the same list with tokens/timestamps filled."""
        if self.driver is not None:
            raise RuntimeError(
                "server is driven by an OnlineEngine; submit through "
                "engine.generate() instead of serve() (concurrent drivers "
                "race over the donated KV cache)"
            )
        now = time.time()
        # draft spec: a live row can advance a full fused dispatch past its
        # stop point before the host truncates it; host-spec absorbs every
        # round (writes reach pos+gamma plus the gamma+1 parking region)
        headroom = self._headroom()
        cap = min(
            self.max_cache_len - self.gen_cfg.max_new_tokens - headroom,
            self._prefix_len + self.prompt_buckets[-1],
        )
        for r in requests:
            r.submitted_at = now
            if len(r.input_ids) > cap:
                raise ValueError(
                    f"prompt {len(r.input_ids)} exceeds capacity {cap} "
                    f"(cache {self.max_cache_len}, largest bucket "
                    f"{self.prompt_buckets[-1]})"
                )
            err = self._check_prefix(r)
            if err is not None:
                raise ValueError(err)
        self._queue.extend(requests)
        while self._queue or self._active():
            self._admit()
            self._decode_round()
        return requests

    def stats(self, requests: List[Request]) -> Dict[str, Any]:
        lat = [r.finished_at - r.submitted_at for r in requests if r.finished_at]
        ttft = [r.first_token_at - r.submitted_at for r in requests if r.first_token_at]
        toks = sum(len(r.tokens) for r in requests)
        wall = max((r.finished_at or 0.0) for r in requests) - min(
            r.submitted_at for r in requests
        )
        out = {
            "requests": len(requests),
            "tokens": toks,
            "tokens_per_sec": toks / wall if wall > 0 else float("nan"),
            "mean_latency_s": float(np.mean(lat)) if lat else float("nan"),
            "mean_ttft_s": float(np.mean(ttft)) if ttft else float("nan"),
        }
        if self.spec_proposed:
            out["spec_acceptance"] = round(
                self.spec_accepted / self.spec_proposed, 3
            )
        return out
