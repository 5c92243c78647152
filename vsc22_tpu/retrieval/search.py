"""Similarity search as sharded GEMM + top-k (the FAISS replacement).

Contracts reproduced (reference, for cross-checking — original TPU design):
  - k-NN search:            D1/infer/vsc/index.py:167-177
  - global-k budget search: D1/infer/vsc/index.py:142-165 +
                            D1/infer/vsc/exhaustive_search.py:206-292

The reference's "adaptive range search" iterates query batches host-side,
shrinking a radius until the result count lands in [global_k, 2*global_k],
then sorts and truncates to global_k — i.e. its output is exactly the global
top-`global_k` entries of the Q×R inner-product matrix. We compute that
directly on device:

  1. per-query-row top-m candidates via tiled GEMM + `lax.top_k`
     (a `lax.scan` over reference tiles with a running merge, so the full
     similarity matrix never materializes in HBM);
  2. the global threshold τ = k-th best of the collected candidates;
  3. rows whose m-th candidate still exceeds τ are rescanned with doubled m
     (exactness fix-up; rare in practice);
  4. host-side sort + truncate.

Fast-exact scan: the default single-pass variant extracts only `extract_e`
entries per reference tile (iterative max — ~10x cheaper than a per-tile
`lax.top_k`) and carries, per row, the running max of each tile's e-th
extracted score. Every entry NOT extracted from a tile is bounded above by
that tile's e-th extracted value — computed from the very same GEMM output,
so the bound is bitwise, not a numerical estimate. A row is provably exact
when its bound stays strictly below its found k-th score; the rare rows that
fail the certificate are rescanned through the full per-tile `lax.top_k`
path. No second verification GEMM is needed.

Exactness contract: with the default `use_approx=False` every per-tile
selection is `lax.top_k`, so `global_topk`/`threshold_search` results are
exactly the reference's adaptive-range-search semantics. `use_approx=True`
opts into `lax.approx_max_k` per tile (~1.6x faster at 2.4M rows, measured
recall 1.000 at recall_target=0.99) — results are then high-recall
approximate and τ itself derives from approximate scores; use only where
the consumer tolerates it (never the µAP-critical candidate generation).

Multi-chip: references are sharded along the mesh's ``data`` axis with
`shard_map`; each device scans its shard, local top-k results are
all-gathered over ICI and re-reduced. Queries are replicated (they are tiny
compared to the reference corpus).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = float(np.finfo(np.float32).min)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _device_memory_bytes() -> int:
    """Best-effort HBM capacity of the default device (v5e default: 16 GB)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return int(limit)
    except Exception:
        pass
    return 16 * 2**30


def _pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    n = x.shape[0]
    padded = _round_up(max(n, 1), multiple)
    if padded == n:
        return x
    return np.concatenate([x, np.zeros((padded - n,) + x.shape[1:], x.dtype)], axis=0)


def _merge_topk(best_s, best_i, new_s, new_i, k: int):
    """Merge two per-row candidate sets, keeping the row-wise top-k."""
    s = jnp.concatenate([best_s, new_s], axis=1)
    i = jnp.concatenate([best_i, new_i], axis=1)
    sel_s, sel_pos = jax.lax.top_k(s, k)
    sel_i = jnp.take_along_axis(i, sel_pos, axis=1)
    return sel_s, sel_i


def _row_topk_impl(
    queries, refs, num_valid, *, k: int, ref_tile: int, vary_axis=None,
    compute_dtype=None, use_approx: bool = False, extract_e: int = 0,
):
    """Per-query-row top-k of `queries @ refs.T`, scanning reference tiles.

    queries: [Tq, D]; refs: [Nr_padded, D] with Nr_padded % ref_tile == 0.
    Rows of `refs` at index >= num_valid (traced scalar) score -inf.
    Returns (scores [Tq, k], indices [Tq, k]), sorted descending per row.
    Inside shard_map, `vary_axis` marks the scan carry as varying over the
    mesh axis (required by shard_map's varying-manual-axes typing).
    `compute_dtype=bfloat16` runs the GEMM operands in bf16 (f32 accumulate):
    ~4x faster on the MXU, sim error ~1e-3 on unit vectors.

    extract_e > 0 selects the CHEAP per-tile extraction: instead of a full
    [Tq, ref_tile] `lax.top_k` (~100x the tile's GEMM cost), only the top
    `extract_e` entries per tile are peeled with iterative max+mask (e VPU
    passes) before the narrow carry merge, and a third output `bound [Tq]`
    is returned: the running max over tiles of the e-th extracted score,
    an exact (bitwise, same GEMM values) upper bound on every entry the
    extraction did NOT surface. A row whose bound reaches its k-th returned
    score may be truncated — callers MUST rescan such rows through the
    exact path (see row_topk).
    """
    nr, dim = refs.shape
    num_tiles = nr // ref_tile
    tq = queries.shape[0]
    queries = queries.astype(compute_dtype or jnp.float32)
    refs = refs.astype(compute_dtype or jnp.float32)
    refs_tiled = refs.reshape(num_tiles, ref_tile, dim)
    kk = min(k, ref_tile)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, ref_tile), 1)

    def step(carry, inp):
        tile_idx, ref_block = inp
        sims = jax.lax.dot_general(
            queries,
            ref_block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                None if compute_dtype is not None else jax.lax.Precision.HIGH
            ),
        )  # [Tq, ref_tile] — MXU GEMM
        col0 = tile_idx * ref_tile
        sims = jnp.where(col0 + col_iota < num_valid, sims, NEG_INF)
        if extract_e:
            best, bound = carry
            es, ei = [], []
            cur = sims
            for _ in range(extract_e):
                m = jnp.max(cur, axis=1)
                a = jnp.argmax(cur, axis=1)
                es.append(m)
                ei.append(a + col0)
                cur = jnp.where(col_iota == a[:, None], NEG_INF, cur)
            # es[-1] (this tile's e-th extracted score) upper-bounds every
            # entry of this tile the extraction did not surface — same GEMM
            # values, so the bound is bitwise-exact.
            bound = jnp.maximum(bound, es[-1])
            merged = _merge_topk(
                *best, jnp.stack(es, axis=1), jnp.stack(ei, axis=1), k
            )
            return (merged, bound), None
        if use_approx:
            # TPU-accelerated partial reduction; measured recall@32 = 1.000
            # vs exact at full corpus scale, ~1.6x faster than lax.top_k.
            s, i = jax.lax.approx_max_k(sims, kk, recall_target=0.99)
            i = i.astype(jnp.int32)
        else:
            s, i = jax.lax.top_k(sims, kk)
        if kk < k:
            s = jnp.concatenate([s, jnp.full((tq, k - kk), NEG_INF, s.dtype)], axis=1)
            i = jnp.concatenate([i, jnp.zeros((tq, k - kk), i.dtype)], axis=1)
        return _merge_topk(*carry, s, i + col0, k), None

    init = (
        jnp.full((tq, k), NEG_INF, jnp.float32),
        jnp.zeros((tq, k), jnp.int32),
    )
    if extract_e:
        init = (init, jnp.full((tq,), NEG_INF, jnp.float32))
    if vary_axis is not None:
        init = jax.tree.map(lambda x: jax.lax.pcast(x, (vary_axis,), to="varying"), init)
    carry, _ = jax.lax.scan(
        step, init, (jnp.arange(num_tiles, dtype=jnp.int32), refs_tiled)
    )
    if extract_e:
        (scores, indices), bound = carry
        return scores, indices, bound
    scores, indices = carry
    return scores, indices


@functools.partial(
    jax.jit, static_argnames=("k", "ref_tile", "extract_e")
)
def _row_topk_fast(queries, refs, num_valid, *, k: int, ref_tile: int,
                   extract_e: int = 16):
    """Single-device jit entry of the cheap-extraction scan (see
    `_row_topk_impl` with extract_e > 0). Returns (scores, indices, bound)
    where `bound[q]` exactly upper-bounds every corpus entry the extraction
    did not surface for row q."""
    return _row_topk_impl(
        queries, refs, num_valid, k=k, ref_tile=ref_tile, extract_e=extract_e
    )


@functools.partial(
    jax.jit, static_argnames=("k", "ref_tile", "compute_dtype", "use_approx")
)
def _row_topk_local(
    queries, refs, num_valid, *, k: int, ref_tile: int, compute_dtype=None,
    use_approx: bool = False,
):
    return _row_topk_impl(
        queries, refs, num_valid, k=k, ref_tile=ref_tile,
        compute_dtype=compute_dtype, use_approx=use_approx,
    )


def _make_sharded_row_topk(
    mesh: Mesh, axis: str, *, k: int, ref_tile: int, shard_rows: int,
    compute_dtype=None, use_approx: bool = False, extract_e: int = 0,
):
    """shard_map'd row-top-k: refs row-sharded along `axis`, queries
    replicated. With extract_e > 0 each device runs the cheap-extraction
    scan on its shard and the per-shard truncation bounds are max-reduced
    over ICI, so the third output certifies the GLOBAL result (same
    truncation caveat as `_row_topk_fast`; callers rescan flagged rows
    through the exact sharded path)."""

    def local(q, r, num_valid):
        idx = jax.lax.axis_index(axis)
        base = idx * shard_rows
        local_valid = jnp.clip(num_valid - base, 0, shard_rows)
        out = _row_topk_impl(
            q, r, local_valid, k=k, ref_tile=ref_tile, vary_axis=axis,
            compute_dtype=compute_dtype, use_approx=use_approx,
            extract_e=extract_e,
        )
        s, i = out[:2]
        i = i + base
        # Gather every device's local winners over ICI and re-reduce.
        s_all = jax.lax.all_gather(s, axis)  # [nd, Tq, k]
        i_all = jax.lax.all_gather(i, axis)
        nd, tq, _ = s_all.shape
        s_flat = jnp.transpose(s_all, (1, 0, 2)).reshape(tq, nd * k)
        i_flat = jnp.transpose(i_all, (1, 0, 2)).reshape(tq, nd * k)
        sel_s, sel_pos = jax.lax.top_k(s_flat, k)
        sel_i = jnp.take_along_axis(i_flat, sel_pos, axis=1)
        if extract_e:
            # An unseen entry on ANY shard is bounded by that shard's bound;
            # the k-th global winner can only exceed per-shard k-ths, so the
            # shard-max bound certifies the merged result too.
            bound = jax.lax.pmax(out[2], axis)
            return sel_s, sel_i, bound
        return sel_s, sel_i

    # After all_gather + identical reduction the outputs are replicated on
    # every device; that replication is not statically inferable, hence
    # check_vma=False.
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P(), P()) if extract_e else (P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


class SimilaritySearcher:
    """Reusable searcher over a fixed reference matrix.

    Pads and (optionally) shards the reference matrix once; serves k-NN and
    global-top-k queries. Single-device by default; pass a `Mesh` with a data
    axis to shard the references row-wise across devices.
    """

    def __init__(
        self,
        refs: np.ndarray,
        mesh: Optional[Mesh] = None,
        mesh_axis: str = "data",
        ref_tile: int = 8192,
        query_tile: int = 4096,
        compute_dtype=None,
        use_approx: bool = False,
        transfer_dtype=np.float32,
        extract_e: int = 16,
        use_fused_extract: Optional[bool] = None,
    ):
        self.num_refs = int(refs.shape[0])
        self.compute_dtype = compute_dtype
        self.use_approx = use_approx
        self.transfer_dtype = np.dtype(transfer_dtype)
        # Per-tile extraction width of the fast-exact scan (see
        # _row_topk_fast); 0 disables it (always full per-tile top_k).
        self.extract_e = extract_e
        # Fused Pallas extraction (ops/pallas_topk): GEMM + per-block top-e
        # peel in VMEM, certificate-compatible with the XLA fast scan. None
        # = auto (TPU backend, single device, corpus large enough to
        # amortize). Falls back to the XLA scan on any kernel failure.
        # Memory note: the fused path caches bf16 hi/lo splits of the
        # corpus (= one extra f32-equivalent copy) while self.refs stays
        # resident for suspect rescans — ~2x corpus footprint on device
        # (e.g. ~5 GB at 1.28M x 512 f32). The auto gate declines when that
        # doubled footprint would crowd HBM; an explicit True overrides.
        self.use_fused_extract = use_fused_extract
        self._fused_tile_q, self._fused_tile_r, self._fused_e = 256, 1024, 4
        self._fused_refs_split = None
        self._fused_failed = False
        self.dim = int(refs.shape[1])
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.query_tile = query_tile
        self._sharded_cache = {}

        # transfer_dtype=np.float16 halves the host->device shipping of the
        # packed feature matrices — the dominant cost of corpus-scale search
        # on transfer-limited links (the GEMM still computes in f32/HIGH
        # from the shipped values). Default f32 preserves the exactness
        # contract bit-for-bit.
        if mesh is not None:
            nd = mesh.shape[mesh_axis]
            self.shard_rows = _round_up(max(self.num_refs, 1), nd * 128) // nd
            padded = np.zeros((self.shard_rows * nd, self.dim), self.transfer_dtype)
            padded[: self.num_refs] = refs
            self.ref_tile = self._pick_tile(self.shard_rows, ref_tile)
            self.refs = jax.device_put(padded, NamedSharding(mesh, P(mesh_axis)))
        else:
            padded = _pad_rows(refs.astype(self.transfer_dtype), 128)
            self.ref_tile = self._pick_tile(padded.shape[0], ref_tile)
            self.refs = jax.device_put(padded)

    @staticmethod
    def _pick_tile(rows: int, want: int) -> int:
        tile = min(want, rows)
        return tile if rows % tile == 0 else math.gcd(rows, tile)

    # ------------------------------------------------------------------
    def _fused_active(self, k_pad: int) -> bool:
        """Whether the Pallas fused extraction serves this row_topk call."""
        if (
            self.mesh is not None
            or self.use_approx
            or self.compute_dtype is not None
            or self.extract_e <= 0
            or self._fused_failed
        ):
            return False
        want = self.use_fused_extract
        if want is None:
            want = (
                jax.default_backend() == "tpu"
                and self.num_refs >= 32768
                and self.dim % 128 == 0
                # 2x-footprint guard (refs f32 + bf16 hi/lo splits): stay
                # under half of the device's HBM so the caller's own
                # buffers (queries, sims tiles, models) still fit.
                and 2 * 4 * self.num_refs * self.dim
                < 0.5 * _device_memory_bytes()
            )
        if not want:
            return False
        nb = _round_up(max(self.num_refs, 1), self._fused_tile_r) // self._fused_tile_r
        # Needs more headroom than the XLA scan's 2x sufficiency gate: with
        # only e=4 per block, rows seeking k comparable to nb*e would flag
        # the truncation certificate almost surely (expected blocks holding
        # >= e entries above the row's k-th grows ~ (tile_r*k/Nr)^e) and
        # everything would rescan. 8x keeps the flag rate negligible for
        # the global-budget searches while excluding wide threshold scans.
        return nb * self._fused_e >= 8 * k_pad

    def _get_fused_refs(self):
        if self._fused_refs_split is None:
            from vsc22_tpu.ops.pallas_topk import split_bf16

            r32 = self.refs.astype(jnp.float32)
            pad = _round_up(r32.shape[0], self._fused_tile_r) - r32.shape[0]
            if pad:
                r32 = jnp.pad(r32, ((0, pad), (0, 0)))
            self._fused_refs_split = split_bf16(r32)
        return self._fused_refs_split

    # ------------------------------------------------------------------
    def row_topk(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Per-row top-k; exact unless the searcher opted into use_approx.
        Returns (scores [Nq,k], indices [Nq,k]).

        Exact fast path (default): the scan extracts only `extract_e`
        entries per reference tile (iterative max — ~10x cheaper than a
        per-tile `lax.top_k`) and carries an exact per-row upper bound on
        everything it did not surface (the running max of each tile's e-th
        extracted score — same GEMM values, so bitwise). Rows whose bound
        reaches their found k-th score may have lost candidates to the
        per-tile truncation and are rescanned through the full top_k path;
        all other rows are certified exact with no second pass. The
        returned set is therefore always a true top-k (tie resolution
        aside, same as any selection).
        """
        nq = queries.shape[0]
        k_eff = max(1, min(k, self.num_refs))
        # Jitted programs are specialized on k; pad it to the next power of
        # two (sliced back below) so the budget-doubling callers compile
        # O(log) distinct programs with corpus-independent shapes — compiles
        # are minutes through a relay link and dominate cold-cache search.
        k_pad = 1 << (k_eff - 1).bit_length()
        use_fused = self._fused_active(k_pad)
        q = _pad_rows(
            queries.astype(self.transfer_dtype),
            self._fused_tile_q if use_fused else 128,
        )
        tile = min(self.query_tile, q.shape[0])
        if q.shape[0] % tile:
            q = _pad_rows(q, tile)
        out_s = np.empty((q.shape[0], k_eff), np.float32)
        out_i = np.empty((q.shape[0], k_eff), np.int32)
        num_valid = jnp.int32(self.num_refs)
        num_tiles = max(
            (self.refs.shape[0] if self.mesh is None else self.shard_rows)
            // self.ref_tile,
            1,
        )
        use_fast = (
            not self.use_approx
            and self.compute_dtype is None
            and self.extract_e > 0
            # the fast scan can surface at most e*num_tiles entries per row
            # (per shard, when sharded — each shard contributes its own k)
            and self.extract_e * num_tiles >= 2 * k_pad
        )
        fn = None if use_fast else self._get_fn(k_pad)
        for start in range(0, q.shape[0], tile):
            q_dev = jnp.asarray(q[start : start + tile])
            s = None
            if use_fused:
                from vsc22_tpu.ops import pallas_topk

                try:
                    qh, ql = pallas_topk.split_bf16(q_dev)
                    s, i, bound = pallas_topk.extract_topk(
                        qh, ql, *self._get_fused_refs(),
                        jnp.full((1, 1), self.num_refs, jnp.int32),
                        e=self._fused_e, tile_q=self._fused_tile_q,
                        tile_r=self._fused_tile_r, k=k_pad,
                        interpret=jax.default_backend() != "tpu",
                    )
                    # Dispatch is async: surface any runtime (post-compile)
                    # kernel fault HERE so the except clause can fall back,
                    # instead of crashing at the np.array() fetch below.
                    jax.block_until_ready((s, i, bound))
                except Exception as exc:  # lowering/VMEM/relay failure
                    import logging

                    logging.getLogger(__name__).warning(
                        "fused extraction kernel failed (%s: %s); "
                        "falling back to the XLA scan",
                        type(exc).__name__, exc,
                    )
                    self._fused_failed = True
                    use_fused = False
            if s is None and use_fast:
                if self.mesh is None:
                    s, i, bound = _row_topk_fast(
                        q_dev, self.refs, num_valid,
                        k=k_pad, ref_tile=self.ref_tile, extract_e=self.extract_e,
                    )
                else:
                    s, i, bound = self._get_fast_fn(k_pad)(
                        q_dev, self.refs, num_valid
                    )
            if s is not None:
                s = np.array(s)  # writable (np.asarray of a jax array is RO)
                i = np.array(i)
                # Suspect rows: some unsurfaced corpus entry could reach the
                # found k-th score (truncation bound not strictly below it),
                # or the k-th slot was never filled with a real candidate.
                # The certificate compares at k_eff — the padded tail is not
                # returned, so it cannot widen the suspect set.
                suspect = np.flatnonzero(
                    (np.asarray(bound) >= s[:, k_eff - 1])
                    | (s[:, k_eff - 1] <= NEG_INF / 2)
                )
                # padding rows are all-zero queries; never rescan those
                suspect = suspect[suspect < max(nq - start, 0)]
                if suspect.size:
                    exact_fn = self._get_fn(k_pad)
                    # Pad the suspect batch to a power-of-two row count: the
                    # exact path is shape-specialized, and per-suspect-count
                    # recompiles are minutes each through a relay link.
                    n_sus = int(suspect.size)
                    rows_pad = max(128, 1 << (n_sus - 1).bit_length())
                    qs = np.zeros((rows_pad, q.shape[1]), q.dtype)
                    qs[:n_sus] = q[start + suspect]
                    es, ei = exact_fn(jnp.asarray(qs), self.refs, num_valid)
                    s[suspect] = np.asarray(es)[:n_sus]
                    i[suspect] = np.asarray(ei)[:n_sus]
            else:
                s, i = fn(q_dev, self.refs, num_valid)
                s, i = np.asarray(s), np.asarray(i)
            out_s[start : start + tile] = s[:, :k_eff]
            out_i[start : start + tile] = i[:, :k_eff]
        return out_s[:nq], out_i[:nq]

    def _get_fn(self, k: int):
        if self.mesh is None:
            return functools.partial(
                _row_topk_local, k=k, ref_tile=self.ref_tile,
                compute_dtype=self.compute_dtype, use_approx=self.use_approx,
            )
        key = ("exact", k)
        if key not in self._sharded_cache:
            self._sharded_cache[key] = _make_sharded_row_topk(
                self.mesh,
                self.mesh_axis,
                k=k,
                ref_tile=self.ref_tile,
                shard_rows=self.shard_rows,
                compute_dtype=self.compute_dtype,
                use_approx=self.use_approx,
            )
        return self._sharded_cache[key]

    def _get_fast_fn(self, k: int):
        key = ("fast", k)
        if key not in self._sharded_cache:
            self._sharded_cache[key] = _make_sharded_row_topk(
                self.mesh,
                self.mesh_axis,
                k=k,
                ref_tile=self.ref_tile,
                shard_rows=self.shard_rows,
                extract_e=self.extract_e,
            )
        return self._sharded_cache[key]

    # ------------------------------------------------------------------
    def global_topk(
        self, queries: np.ndarray, global_k: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Global top-`global_k` entries of the Q×R similarity matrix.

        Exact with the default `use_approx=False` (per-tile `lax.top_k` plus
        the budget-doubling fix-up below); with `use_approx=True` both the
        candidate lists and the threshold τ derive from `lax.approx_max_k`
        and the result is high-recall approximate. Returns (q_idx, r_idx,
        score) sorted by descending score, length min(global_k, Nq*num_refs).
        """
        nq = queries.shape[0]
        total = nq * self.num_refs
        k = min(global_k, total)
        if k <= 0:
            z = np.zeros((0,), np.int64)
            return z, z, np.zeros((0,), np.float32)

        m = min(self.num_refs, max(16, -(-2 * k // nq)))
        scores, indices = self.row_topk(queries, m)

        while True:
            flat = scores.reshape(-1)
            if k >= flat.size:
                tau = NEG_INF / 2
            else:
                tau = np.partition(flat, flat.size - k)[flat.size - k]
            if m >= self.num_refs:
                break
            suspect = scores[:, -1] > tau
            if not suspect.any():
                break
            # Rows whose candidate list may be truncated above τ: rescan deeper.
            m = min(self.num_refs, m * 2)
            new_s, new_i = self.row_topk(queries[suspect], m)
            grown_s = np.full((nq, m), NEG_INF, np.float32)
            grown_i = np.zeros((nq, m), np.int32)
            grown_s[:, : scores.shape[1]] = scores
            grown_i[:, : indices.shape[1]] = indices
            grown_s[suspect] = new_s
            grown_i[suspect] = new_i
            scores, indices = grown_s, grown_i

        q_idx = np.repeat(np.arange(nq, dtype=np.int64), scores.shape[1])
        r_idx = indices.reshape(-1).astype(np.int64)
        s = scores.reshape(-1)
        keep = s >= tau
        q_idx, r_idx, s = q_idx[keep], r_idx[keep], s[keep]
        order = np.argsort(-s, kind="stable")[:k]
        return q_idx[order], r_idx[order], s[order]


    # ------------------------------------------------------------------
    def threshold_search(
        self, queries: np.ndarray, threshold: float, k0: int = 1024
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All (row, col, score) with score > threshold (exact range search).

        Reference semantics (M1/infer/infer_matching.py:218-247): k-NN at
        k=1024 per row, with an unbounded range-search fallback for rows
        whose k-th hit still clears the threshold. Here rows that overflow
        are rescanned with a doubled k until exact.
        """
        nq = queries.shape[0]
        k = max(1, min(k0, self.num_refs))
        active = np.arange(nq, dtype=np.int64)
        rows_out: List[np.ndarray] = []
        cols_out: List[np.ndarray] = []
        scores_out: List[np.ndarray] = []
        while active.size:
            scores, indices = self.row_topk(queries[active], k)
            # A row is resolved once its k-th hit falls below the threshold
            # (or the scan reached the full corpus). Only overflow rows are
            # rescanned at the doubled width — resolved rows emit their hits
            # immediately, so peak memory is O(|overflow| * k), not O(nq * k).
            if k >= self.num_refs:
                overflow = np.zeros(active.size, bool)
            else:
                overflow = scores[:, -1] > threshold
            done = ~overflow
            if done.any():
                s, idx = scores[done], indices[done]
                hit = s > threshold
                rows_out.append(np.repeat(active[done], hit.sum(axis=1)))
                cols_out.append(idx[hit].astype(np.int64))
                scores_out.append(s[hit])
            active = active[overflow]
            k = min(self.num_refs, k * 2)
        if not rows_out:
            z = np.zeros((0,), np.int64)
            return z, z, np.zeros((0,), np.float32)
        rows = np.concatenate(rows_out)
        cols = np.concatenate(cols_out)
        s = np.concatenate(scores_out)
        order = np.argsort(rows, kind="stable")
        return rows[order], cols[order], s[order]


def knn_search(
    queries: np.ndarray, refs: np.ndarray, k: int, mesh: Optional[Mesh] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot per-row k-NN (inner product). See `SimilaritySearcher.row_topk`."""
    return SimilaritySearcher(refs, mesh=mesh).row_topk(queries, k)


def global_topk_search(
    queries: np.ndarray, refs: np.ndarray, global_k: int, mesh: Optional[Mesh] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-shot exact global top-k search. See `SimilaritySearcher.global_topk`."""
    return SimilaritySearcher(refs, mesh=mesh).global_topk(queries, global_k)


@functools.partial(jax.jit, static_argnames=("vq", "vr"))
def _pair_max_chunk(qf, q_seg, rf, r_seg, *, vq: int, vr: int):
    """[vq+1, vr+1] max frame-sim per (query video, ref video) for one
    (query-rows x ref-rows) block. Segment index vq/vr is the padding
    bucket; empty segments come back -inf (segment_max's fill)."""
    sims = jax.lax.dot_general(
        qf,
        rf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )  # [cq, cr]
    by_ref = jax.ops.segment_max(sims.T, r_seg, num_segments=vr + 1)  # [vr+1, cq]
    return jax.ops.segment_max(by_ref.T, q_seg, num_segments=vq + 1)  # [vq+1, vr+1]


def video_pair_max_scores(
    q_features: np.ndarray,
    q_video_idx: np.ndarray,
    r_features: np.ndarray,
    r_video_idx: np.ndarray,
    n_q_videos: int,
    n_r_videos: int,
    row_chunk: int = 16384,
) -> np.ndarray:
    """Dense [n_q_videos, n_r_videos] matrix of max frame similarities.

    The matching track's recall stage (M1/infer/infer_matching.py:218-247)
    only consumes the per-video-pair MAX frame similarity — never the
    individual frame hits — so aggregating on device (GEMM + two
    segment-max passes) and fetching the tiny video-pair matrix replaces
    the k-NN/doubling range search plus a host hit list that can run to
    millions of rows (the dominant recall cost on a relay-attached chip).

    `*_video_idx` rows holding -1 (padding) are routed to a discard
    bucket. Pairs with no frames come back -inf, matching their absence
    from a hit-list aggregation.
    """
    pad_q = np.where(q_video_idx < 0, n_q_videos, q_video_idx).astype(np.int32)
    pad_r = np.where(r_video_idx < 0, n_r_videos, r_video_idx).astype(np.int32)
    qf = np.ascontiguousarray(q_features, np.float32)
    rf = np.ascontiguousarray(r_features, np.float32)
    out = np.full((n_q_videos, n_r_videos), -np.inf, np.float32)
    pending = []
    for q0 in range(0, qf.shape[0], row_chunk):
        q1 = min(q0 + row_chunk, qf.shape[0])
        for r0 in range(0, rf.shape[0], row_chunk):
            r1 = min(r0 + row_chunk, rf.shape[0])
            pending.append(
                _pair_max_chunk(
                    qf[q0:q1], pad_q[q0:q1], rf[r0:r1], pad_r[r0:r1],
                    vq=n_q_videos, vr=n_r_videos,
                )
            )
    for block in pending:  # dispatch-all-then-fetch
        np.maximum(out, np.asarray(block)[:n_q_videos, :n_r_videos], out=out)
    return out
