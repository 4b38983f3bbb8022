"""Row-vectorized Sellers semi-global DP: k-edit candidate scan on TPU.

The indel-capable analog of the reference's Wu-Manber bitvector scan
(``shift_and_inexact.cc:249-350``).  For every text boundary ``b`` and
pattern ``p`` it computes

    mindist(b, p) = min edits to align p against some text substring
                    ending at b   (capped at k+1)

with the reference's EOS gating: all error transitions are disallowed on an
EOS character, so matches never straddle entry boundaries.  Identical
candidate sets to the reference's bitvectors (a bit set in row ``l`` there
means "prefix matches with <= l errors"; the minimal such ``l`` *is* the
Sellers distance).

TPU mapping: the pattern axis is a short sequential loop (Lmax rows); each
row is elementwise VPU work over the whole [P, B] tile.  The insertion
recurrence (a slope-1 running min along the text) exploits the k+1 value cap:
a chain longer than k saturates, so the running min collapses to a k-term
shifted min — O(k) shifted adds instead of an associative scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("eos", "k", "indels", "cap"))
def _sellers_block(codes, match, lengths, eos, k, indels, cap):
    """codes: [W] uint8 (left halo Lmax+k, shipped narrow — the tunneled
    transport runs ~56 MB/s); match: [Lmax, P, alpha] bool; lengths: [P]
    int32; eos: the EOS alphabet code.

    Returns ONE packed int32 array [1 + 2*cap]: (count, flat_idx...,
    dist...) over the [P, W] grid of per-boundary min distances
    (boundary b = i + 1).  Packed into a single output because each
    extra jit output costs a transport round-trip on this backend.

    The non-EOS run length ``nrun`` is derived on device (a max-scan of
    EOS positions).  Within-chunk truncation at the left edge is safe:
    candidates in the halo are discarded by the caller, and kept
    positions (>= halo >= k in) only ever test ``nrun >= t`` for t <= k.
    """
    Lmax, P, alpha = match.shape
    W = codes.shape[0]
    INF = np.int32(k + 1)
    codes = codes.astype(jnp.int32)
    iota = jax.lax.iota(jnp.int32, W)
    last_eos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(codes == eos, iota, -1))
    nrun = iota - last_eos
    # row-invariant masks, hoisted: the per-class one-hot rows (an XLA
    # gather from the [P, alpha] match row is ~10x the cost of the whole
    # row's elementwise DP; an unrolled broadcast-AND over the tiny
    # static alpha axis fuses into one pass) and the EOS / run gates
    eq = codes[None, :] == jax.lax.iota(jnp.int32, alpha)[:, None]  # [A, W]
    at_eos = (nrun == 0)[None, :]
    allowed = [(nrun >= t)[None, :] for t in range(k + 1)]

    def row(j, D):
        # D: [P, W] distances for pattern prefix j
        mrow = match[j]  # [P, alpha]
        ok = jnp.zeros((P, W), bool)
        for c in range(alpha):
            ok = ok | (eq[c][None, :] & mrow[:, c][:, None])
        subc = jnp.where(ok, 0, 1).astype(jnp.int32)
        # EOS: no sub/ins/del; match of a pattern char vs EOS is already
        # impossible (EOS never in a match row), so make diag cost INF there.
        diag_prev = jnp.concatenate(
            [jnp.full((P, 1), INF, jnp.int32), D[:, :-1]], axis=1
        )
        base = jnp.where(at_eos, INF, diag_prev + subc)
        if indels:
            dele = jnp.where(at_eos, INF, D + 1)
            base = jnp.minimum(base, dele)
        base = jnp.minimum(base, INF)
        out = base
        if indels:
            for t in range(1, k + 1):
                shifted = jnp.concatenate(
                    [jnp.full((P, t), INF, jnp.int32), base[:, :-t]], axis=1
                )
                out = jnp.minimum(
                    out, jnp.where(allowed[t], shifted + t, INF)
                )
        out = jnp.minimum(out, INF)
        # rows past a pattern's length are identity (pattern finished)
        active = (j < lengths)[:, None]
        return jnp.where(active, out, D)

    D0 = jnp.zeros((P, W), dtype=jnp.int32)
    D = jax.lax.fori_loop(0, Lmax, row, D0)

    from .compact import _topk_idx

    # two-level compaction along the TEXT axis: compact the occupied
    # boundary columns (almost-empty [W] mask), then the gathered
    # [P, pcap] submatrix — a flat top_k over the whole [P, W] grid costs
    # as much as the DP itself.  Emitted order is (pattern, column-rank),
    # not flat order: the caller lexsorts by (end, pattern) anyway, and
    # the overflow contract holds because count >= occupied columns, so
    # count <= cap implies every occupied column was kept.
    hit = D <= k
    colcnt = jnp.sum(hit, axis=0, dtype=jnp.int32)  # [W]
    count = jnp.sum(colcnt, dtype=jnp.int32)
    pcap = min(cap, W)
    pidx = _topk_idx(colcnt > 0, pcap)  # ascending columns, fill W
    sub = hit[:, jnp.minimum(pidx, W - 1)] & (pidx < W)[None, :]
    sidx = _topk_idx(sub.reshape(-1), cap)  # over [P, pcap] row-major
    svalid = sidx < P * pcap
    cols = pidx[jnp.minimum(sidx % pcap, pcap - 1)]
    idx = jnp.where(svalid, (sidx // pcap) * W + cols, P * W)
    d = jnp.concatenate([D.reshape(-1), jnp.zeros((1,), jnp.int32)])
    return jnp.concatenate([count[None], idx.astype(jnp.int32), d[idx]])


def nonexact_runs(codes: np.ndarray, eos_code: int) -> np.ndarray:
    """nrun[i] = length of the non-EOS run ending at (and including) i.

    Segment-repeat formulation: ~20x faster than the
    cumsum/maximum.accumulate version (ufunc.accumulate is scalar-loop
    slow in numpy)."""
    n = len(codes)
    eos_pos = np.flatnonzero(codes == eos_code)
    bounds = np.concatenate([[-1], eos_pos]).astype(np.int64)
    seg_len = np.diff(np.concatenate([[0], eos_pos, [n]]))
    prev = np.repeat(bounds, seg_len)
    return (np.arange(n, dtype=np.int64) - prev).astype(np.int32)


class SellersScanner:
    """Block-streaming k-edit candidate scanner.

    Yields (end_position, pattern_index_0based, mindist) ordered by
    (end, pattern)."""

    def __init__(self, tables, k: int, indels: bool = True,
                 block: int = 1 << 20, cap: int = 1 << 12):
        # cap default: the packed result row is 1 + 2*cap int32 and the
        # transport runs ~20 MB/s on fetches — a 64K cap costs ~26 ms of
        # payload per block while typical blocks carry a few hundred
        # candidates; overflow retries (geometric growth) cover dense runs
        self.tables = tables
        self.k = k
        self.indels = indels
        self.block = block
        self.cap = cap
        # match layout [Lmax, P, alpha] for row-major dynamic indexing
        self.match = jnp.asarray(
            np.ascontiguousarray(tables.match.transpose(1, 0, 2))
        )
        self.lengths_dev = jnp.asarray(tables.lengths)
        # optional per-block progress callback (pattern_match.h:144-155)
        self.progress = None

    # a jax.sharding.Mesh attached by the model layer (parallel.shard.
    # auto_mesh); scans route through the sharded per-shard DP when set
    mesh = None

    def _block_inputs(self, codes, start, halo, W, n):
        t = self.tables
        lo = start - halo
        chunk = np.full(W, t.eos_code, dtype=np.uint8)
        s0 = max(0, lo)
        hi = min(n, start + self.block)
        chunk[s0 - lo : W - max(0, (start + self.block) - n)] = codes[s0:hi]
        return lo, jnp.asarray(chunk)

    def scan(self, codes: np.ndarray):
        """Pipelined block scan: block i+1 is dispatched before block i's
        results are collected, hiding the host round-trip behind device
        compute."""
        from collections import deque

        if self.mesh is not None and self.mesh.devices.size > 1:
            from ..parallel.shard import sharded_sellers_scan

            yield from sharded_sellers_scan(self, codes, self.mesh)
            if self.progress:
                self.progress(1.0)
            return
        t = self.tables
        halo = t.Lmax + self.k
        n = len(codes)
        W = self.block + halo
        pending = deque()

        def collect(lo, dchunk, res, cap):
            if self.progress:
                self.progress(min(1.0, (lo + halo + self.block) / n))
            packed = np.asarray(res)
            count = int(packed[0])
            while count > cap:
                cap = 1 << (count - 1).bit_length()
                self.cap = max(self.cap, cap)
                packed = np.asarray(_sellers_block(
                    dchunk, self.match, self.lengths_dev, t.eos_code,
                    self.k, self.indels, cap,
                ))
                count = int(packed[0])
            if count == 0:
                return
            idx = packed[1 : 1 + count].astype(np.int64)
            dist = packed[1 + cap : 1 + cap + count]
            pos = idx % W  # position within chunk
            pid = idx // W
            keep = pos >= halo  # halo candidates belong to the prior block
            pos, pid, dist = pos[keep], pid[keep], dist[keep]
            ends = lo + pos + 1  # boundary after char
            order = np.lexsort((pid, ends))
            for e, p, d in zip(ends[order], pid[order], dist[order]):
                yield int(e), int(p), int(d)

        for start in range(0, n, self.block):
            lo, dchunk = self._block_inputs(codes, start, halo, W, n)
            res = _sellers_block(dchunk, self.match, self.lengths_dev,
                                 t.eos_code, self.k, self.indels, self.cap)
            pending.append((lo, dchunk, res, self.cap))
            while len(pending) >= 2:
                yield from collect(*pending.popleft())
        while pending:
            yield from collect(*pending.popleft())
