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

import numpy as np

from ..utils.lazyjax import LazyModule, lazy_jit

# ALL jax bindings deferred to first device-path use: the pallas import
# costs ~0.8 s, and under the site-less ``sat`` launcher even ``import
# jax`` costs ~2.5 s (PJRT registration) that host-served one-shot runs
# (native Sellers rows) never need.
jax = LazyModule("jax", "jax", globals())
jnp = LazyModule("jax.numpy", "jnp", globals())
pl = LazyModule("jax.experimental.pallas", "pl", globals())
pltpu = LazyModule("jax.experimental.pallas.tpu", "pltpu", globals())


@lazy_jit(static_argnames=("eos", "k", "indels", "cap"))
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


# ---------------------------------------------------------------------------
# Mosaic Sellers kernel: the k-edit DP on the VPU with in-kernel hit
# extraction.
#
# The XLA _sellers_block above lowers each DP row to a chain of whole-array
# HBM passes (~31 ms per 256 KB block on this backend — 8 Mb/s end-to-end
# for the k=2 filter engine).  The kernel form keeps the whole [8, W] DP
# state in VMEM/registers: text segments ride the SUBLANES (each row carries
# its own left halo, so rows are independent), the pattern loop is unrolled
# on the host with each pattern position's accept bitmask baked as an
# immediate (bit c = pattern accepts code c — any IUPAC class fits), and the
# per-boundary hit stream (mindist <= k) compacts through the same
# rank/shift network as the scan kernel (scan_kernel._row_compact).

SEG = 4096          # text positions per segment row
SEL_HALO = 128      # left halo per row; bounds Lmax + k
SEL_CAP = 128       # compacted hits kept per segment row


def _sellers_kernel(seg_ref, out_ref, cnt_ref, *, bits: tuple,
                    lens: tuple, eos: int, k: int, indels: bool,
                    cap: int):
    """One [8, W] tile: 8 independent text segments through the full
    pattern set's Sellers DP; emits compacted per-row hit slots
    ``(localpos << 15) | (pid << 8) | min(cnt, 127)`` (localpos = r *
    SEG + boundary_start relative to the tile's first owned position)
    and per-row true counts."""
    W = seg_ref.shape[2]
    codes = seg_ref[0].astype(jnp.int32)  # [8, W]
    INF = jnp.int32(k + 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
    at_eos = codes == eos
    not_eos = ~at_eos
    # allowed[t] = (nrun >= t): no EOS among positions i, i-1, .., i-t+1
    allowed = [None, not_eos]
    acc_ne = not_eos
    for t in range(2, k + 1):
        sh = jnp.where(li >= t - 1,
                       pltpu.roll(not_eos.astype(jnp.int32),
                                  shift=t - 1, axis=1), 0) > 0
        acc_ne = acc_ne & sh
        allowed.append(acc_ne)

    def roll_right(x, t, fill):
        return jnp.where(li >= t, pltpu.roll(x, shift=t, axis=1), fill)

    # packed per-position accumulator word: (top_pid << 8) | cnt
    word = jnp.full((8, W), -256, jnp.int32)
    P = len(bits)
    for p in range(P):
        D = jnp.zeros((8, W), jnp.int32)
        for j in range(lens[p]):
            ok = ((jnp.int32(bits[p][j]) >> codes) & 1) > 0
            sub = jnp.where(ok, 0, 1)
            diag = roll_right(D, 1, INF)
            base = jnp.where(at_eos, INF, diag + sub)
            if indels:
                base = jnp.minimum(base, jnp.where(at_eos, INF, D + 1))
            base = jnp.minimum(base, INF)
            out = base
            if indels:
                for t in range(1, k + 1):
                    out = jnp.minimum(
                        out, jnp.where(allowed[t],
                                       roll_right(base, t, INF) + t, INF))
            D = jnp.minimum(out, INF)
        v = jnp.where(D <= k, (jnp.int32(p) << 8) | 1, jnp.int32(-256))
        word = (jnp.maximum(word, v) & jnp.int32(-256)) \
            | ((word & 255) + (v & 255))

    from .pallas.scan_kernel import _row_compact

    hit = (word >= 0) & (li >= SEL_HALO)
    hit32 = hit.astype(jnp.int32)
    pfx = hit32
    s = 1
    while s < W:
        pfx = pfx + jnp.where(li >= s, pltpu.roll(pfx, shift=s, axis=1), 0)
        s *= 2
    rowcnt = pfx[:, W - 1 : W]
    si = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
    localpos = si * SEG + (li - SEL_HALO)
    meta = (localpos << 15) | ((word & jnp.int32(0x7F00))
                               | jnp.minimum(word & 255, 127))
    out = _row_compact([meta], hit, rowcnt, W, cap)
    out_ref[0] = out[0][:, :cap]
    cnt_ref[0] = jnp.broadcast_to(rowcnt, (8, 128))


@lazy_jit(static_argnames=("bits", "lens", "eos", "k", "indels", "cap",
                           "out_cap", "oflow_cap", "interpret"))
def pallas_sellers_scan(seg3, *, bits: tuple, lens: tuple, eos: int,
                        k: int, indels: bool, cap: int = SEL_CAP,
                        out_cap: int = 4096, oflow_cap: int = 64,
                        interpret: bool = False, n: int = 0):
    """Whole-array k-edit candidate scan: :func:`_sellers_kernel` over a
    prebuilt segment matrix (see :func:`segment_matrix`) + the slots
    dense-pack epilogue.  Returns ONE packed int32 row
    [total, oflow_count, pos x out_cap, meta x out_cap,
    oflow_row x oflow_cap] where pos is the 0-based boundary-START
    position i (the reference emits boundary b = i + 1) and meta low
    bits are (pid << 8) | cnt."""
    from .compact import compact_mask

    ntiles = seg3.shape[0]
    kept, counts = pl.pallas_call(
        functools.partial(
            _sellers_kernel, bits=bits, lens=lens, eos=eos, k=k,
            indels=indels, cap=cap,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, 8, cap), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, 8, 128), jnp.int32),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, seg3.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seg3)
    nrows = ntiles * 8
    rowcnt = counts[:, :, 0].reshape(nrows)
    oflow_count, oflow_idx = compact_mask(rowcnt > cap, oflow_cap)
    oflow_row = jnp.where(oflow_idx < nrows, oflow_idx, -1)
    rc = jnp.minimum(rowcnt, cap)
    cum = jnp.cumsum(rc)
    total = cum[nrows - 1]
    j = jax.lax.broadcasted_iota(jnp.int32, (out_cap,), 0)
    row = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    rows = jnp.minimum(row, nrows - 1)
    s = j - (cum[rows] - rc[rows])
    val = kept.reshape(nrows, cap)[rows, jnp.minimum(s, cap - 1)]
    valid = j < total
    localpos = (val & 0x7FFFFFFF) >> 15
    pos = (rows >> 3) * (8 * SEG) + localpos
    return jnp.concatenate([
        total[None], oflow_count[None],
        jnp.where(valid, pos, -1).astype(jnp.int32),
        jnp.where(valid, val, 0).astype(jnp.int32),
        oflow_row.astype(jnp.int32),
    ])


@lazy_jit(static_argnames=("pair_cap", "gcap"))
def _pack_myers_group(stacked, *, pair_cap: int, gcap: int):
    """Compact a stacked group of Myers packed rows to their live pair
    entries (conv_scan._pack_group discipline: tunnel fetch cost scales
    with BYTES, and the rows are almost entirely capacity padding).
    Returns [g npairs][g nslots][gcap pos][gcap mask] — the pair
    sections are each row's live prefix concatenated in row order; the
    host re-segments with a cumsum of the clamped counts and falls back
    to the full stacked fetch if the group total exceeds ``gcap``."""
    g = stacked.shape[0]
    npt = stacked[:, 0]
    nst = stacked[:, 1]
    cnt = jnp.minimum(npt, pair_cap)
    cum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)])
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (gcap,), 0)
    row = jnp.clip(
        jnp.searchsorted(cum, pos_iota, side="right") - 1, 0, g - 1)
    off = pos_iota - cum[row]
    valid = pos_iota < cum[g]
    src = row * (2 + 2 * pair_cap) + 2 + jnp.minimum(off, pair_cap - 1)
    flat = stacked.reshape(-1)
    src = jnp.where(valid, src, 0)
    pos_e = jnp.where(valid, flat[src], 0)
    mask_e = jnp.where(valid, flat[src + pair_cap], 0)
    return jnp.concatenate([npt, nst, pos_e, mask_e])


_SEG_CACHE: dict = {}


def segment_matrix(codes: np.ndarray, eos_code: int):
    """[ntiles, 8, SEL_HALO + SEG] uint8 device segment matrix: row
    (i, r) covers text [base - SEL_HALO, base + SEG) for base =
    (i*8 + r) * SEG, EOS-padded outside the array — each row carries its
    own left halo so segments are DP-independent.  Cached per host array
    identity (scan-resident form, like the phase transpose)."""
    import weakref

    ent = _SEG_CACHE.get(id(codes))
    if ent is not None and ent[0]() is codes:
        return ent[1]
    n = len(codes)
    W = SEL_HALO + SEG
    nrows = max(-(-n // SEG), 1)
    ntiles = -(-nrows // 8)
    padded = np.full(SEL_HALO + ntiles * 8 * SEG, eos_code, np.uint8)
    padded[SEL_HALO : SEL_HALO + n] = codes
    strided = np.lib.stride_tricks.sliding_window_view(
        padded, W)[:: SEG][: ntiles * 8]
    seg3 = jnp.asarray(
        np.ascontiguousarray(strided).reshape(ntiles, 8, W))
    ref = weakref.ref(codes)
    weakref.finalize(codes, _SEG_CACHE.pop, id(codes), None)
    _SEG_CACHE[id(codes)] = (ref, seg3)
    return seg3


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
        self._dev_c = None  # lazy: construction must not init the backend
        # optional per-block progress callback (pattern_match.h:144-155)
        self.progress = None

    @property
    def match(self):
        # match layout [Lmax, P, alpha] for row-major dynamic indexing
        if self._dev_c is None:
            self._dev_c = (
                jnp.asarray(np.ascontiguousarray(
                    self.tables.match.transpose(1, 0, 2))),
                jnp.asarray(self.tables.lengths),
            )
        return self._dev_c[0]

    @property
    def lengths_dev(self):
        self.match
        return self._dev_c[1]

    # a jax.sharding.Mesh attached by the model layer (parallel.shard.
    # auto_mesh); scans route through the sharded per-shard DP when set
    mesh = None
    pallas_interpret = False

    _routes_done = None

    def _route(self, msg: str) -> None:
        """Reference-style '-v' route announcement (see
        ConvScanner._route): names the k-edit kernel actually used."""
        import os

        if self.progress is None and not os.environ.get(
                "SAT_ROUTE_VERBOSE"):
            return
        if self._routes_done is None:
            self._routes_done = set()
        if msg in self._routes_done:
            return
        self._routes_done.add(msg)
        from ..utils.log import timestamp

        timestamp("Route: " + msg)

    # -- native host k-edit machine (one-shot latency path) ------------------

    _host_scanner = None
    # tri-state like ConvScanner.use_host: None = auto (route small/cold
    # scans to the native machine), False = pin the device paths
    use_host = None

    def _host_eligible(self, n: int) -> bool:
        """Route to the native Sellers row machine when fixed device
        costs (Mosaic compile, upload, tunnel round-trips) dominate —
        the one-shot CLI posture (select.cc:103-142 strategy-layer
        spirit)."""
        import os

        if (self.use_host is False or self.pallas_interpret
                or self.mesh is not None or not self.indels):
            return False
        if self.use_host is None and (self.k > 4 or n > (1 << 26)):
            return False
        if os.environ.get("SAT_HOST_SCAN", "1") == "0":
            return False
        if self._host_scanner is None:
            from .host_scan import HostSellers

            self._host_scanner = HostSellers(self.tables, self.k)
        return self._host_scanner.available()

    def host_pairs(self, codes: np.ndarray):
        """(ends, pids) via the native machine (caller checked
        :meth:`_host_eligible`)."""
        ends, pids, _ = self._host_scanner.pairs(np.asarray(codes))
        return ends, pids

    # sticky dense-pack caps (see ConvScanner's slots caps)
    _sout_cap = 1 << 12
    _soflow_cap = 64

    def _kernel_bits(self):
        """(bits, lens) immediates for :func:`_sellers_kernel`."""
        if getattr(self, "_kbits", None) is None:
            t = self.tables
            bits = []
            for p in range(t.P):
                row = []
                for j in range(int(t.lengths[p])):
                    b = 0
                    for c in range(t.alpha):
                        if t.match[p, j, c]:
                            b |= 1 << c
                    row.append(b)
                bits.append(tuple(row))
            self._kbits = (tuple(bits),
                           tuple(int(x) for x in t.lengths))
        return self._kbits

    def kernel_available(self, n: int) -> bool:
        """A Mosaic kernel path handles this config — the Myers
        bit-parallel kernel (preferred) or the row-DP Sellers kernel."""
        import jax as _jax

        t = self.tables
        if self.myers_available(n):
            return True
        return bool(
            (self.pallas_interpret or _jax.default_backend() != "cpu")
            and t.alpha < 31 and t.P <= 127
            and t.Lmax + self.k <= SEL_HALO
            and int(t.lengths.sum()) <= 4096
            and self.k <= 4 and n >= SEG)

    # -- Myers bit-parallel path (ops.pallas.myers_kernel) -------------------

    _MY_SEGC = 2048
    _my_pairs = 1 << 12   # sticky caps (class-level, like the slots caps)
    _my_slots = 1 << 12

    def myers_available(self, n: int) -> bool:
        """Myers kernel eligibility: one int32 word per pattern (len <=
        31, P <= 30 so hit masks fit), warmup halo covers any <= k-edit
        span, Levenshtein recurrence (indels), manageable class count."""
        import jax as _jax

        from .pallas.myers_kernel import MY_HALO

        t = self.tables
        return bool(
            self.indels
            and (self.pallas_interpret or _jax.default_backend() != "cpu")
            and t.P <= 30 and t.Lmax <= 31
            and t.Lmax + self.k <= MY_HALO + 1
            and t.alpha <= 16 and self.k <= 8
            and int(t.lengths.min()) > self.k  # reset-score hit gate
            and n >= self._MY_SEGC)

    def _myers_cfg(self):
        if getattr(self, "_my_cfg", None) is None:
            from .pallas.myers_kernel import myers_eqbits

            self._my_cfg = myers_eqbits(self.tables)
        return self._my_cfg

    def _myers_dispatch(self, codes, caps):
        """Chained kernel + epilogue device calls (no sync).  Returns
        (packed_row, (slots, counts)) — the kernel outputs are kept so
        an overflow retry re-runs ONLY the cap-dependent XLA epilogue
        (a fresh Mosaic compile per cap config would cost minutes)."""
        from .pallas.myers_kernel import (myers_transpose,
                                          pallas_myers_epilogue,
                                          pallas_myers_kernel)

        eqwords, wordspec, lens, classes = self._myers_cfg()
        t = self.tables
        x4 = myers_transpose(np.asarray(codes), t.eos_code, self._MY_SEGC)
        sl, ct = pallas_myers_kernel(
            x4, eqwords=eqwords, wordspec=wordspec, lens=lens,
            classes=classes, eos=t.eos_code, k=self.k,
            interpret=self.pallas_interpret)
        row = pallas_myers_epilogue(
            sl, ct, ntiles=x4.shape[0], ngroups=x4.shape[1],
            segc=self._MY_SEGC, slot_cap=caps[1], pair_cap=caps[0],
            n=len(codes))
        return row, (sl, ct, x4.shape[0], x4.shape[1], len(codes))

    def _myers_decode(self, packed, caps):
        npairs = int(packed[0])
        pos = packed[2 : 2 + npairs].astype(np.int64)
        mask = packed[2 + caps[0] : 2 + caps[0] + npairs].astype(np.int64)
        return self._myers_pairs_from(pos, mask)

    def _myers_pairs_from(self, pos, mask):
        P = self.tables.P
        sel = ((mask[:, None] >> np.arange(P)[None, :]) & 1) > 0
        mi, pi = np.nonzero(sel)
        return pos[mi] + 1, pi.astype(np.int64)

    def _myers_pairs(self, codes):
        cls = type(self)
        caps = (self._my_pairs, self._my_slots)
        res, kout = self._myers_dispatch(codes, caps)
        while True:
            packed = np.asarray(jax.device_get(res))
            npairs, nslots = int(packed[0]), int(packed[1])
            if npairs <= caps[0] and nslots <= caps[1]:
                break
            cls._my_pairs = max(
                caps[0], 1 << (max(npairs, 1) - 1).bit_length())
            cls._my_slots = max(
                caps[1], 1 << (max(nslots, 1) - 1).bit_length())
            caps = (self._my_pairs, self._my_slots)
            res = self._myers_epilogue_retry(kout, caps)
        return self._myers_decode(packed, caps)

    def _myers_epilogue_retry(self, kout, caps):
        from .pallas.myers_kernel import pallas_myers_epilogue

        sl, ct, ntiles, ngroups, n = kout
        return pallas_myers_epilogue(
            sl, ct, ntiles=ntiles, ngroups=ngroups,
            segc=self._MY_SEGC, slot_cap=caps[1],
            pair_cap=caps[0], n=n)

    def _pairs_dispatch(self, codes: np.ndarray, caps):
        """Launch one kernel scan (no sync)."""
        bits, lens = self._kernel_bits()
        t = self.tables
        seg3 = segment_matrix(np.asarray(codes), t.eos_code)
        return pallas_sellers_scan(
            seg3, bits=bits, lens=lens, eos=t.eos_code, k=self.k,
            indels=self.indels, out_cap=caps[0], oflow_cap=caps[1],
            interpret=self.pallas_interpret, n=len(codes))

    _my_gcap = 1 << 16  # group-pack entry capacity (grows on overflow)

    def scan_pairs_stream(self, blocks, depth: int = 32):
        """Pipelined :meth:`scan_pairs` over an iterator of code arrays:
        scan i+1 dispatches before scan i's packed row returns; rows are
        fetched in same-caps STACKED groups on a background thread (a
        solo fetch pays the ~34 ms tunnel round-trip per rep — the
        scan_stream transport discipline).  Yields (i, ends, pids) in
        order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp

        if self._pool is None:
            type(self)._pool = ThreadPoolExecutor(max_workers=1)
        pend = deque()  # (i, codes, caps, res)
        inflight = None

        def launch(take):
            group = [pend.popleft()]
            while pend and len(group) < take \
                    and pend[0][2] == group[0][2]:
                group.append(pend.popleft())
            rs = [g[3] for g in group]
            caps = group[0][2]
            if len(rs) > 1 and caps[0] == "my":
                # device-side live-prefix pack: fetch bytes scale with
                # true pair counts, not the cap padding
                stacked = jnp.stack(rs)
                gcap = self._my_gcap
                res = _pack_myers_group(stacked, pair_cap=caps[1],
                                        gcap=gcap)
                fut = self._pool.submit(
                    lambda r=res: np.asarray(jax.device_get(r)))
                return ("pk", group, stacked, fut, gcap)
            stacked = jnp.stack(rs) if len(rs) > 1 else rs[0]
            fut = self._pool.submit(
                lambda r=stacked: np.asarray(jax.device_get(r)))
            return ("raw", group, None, fut, 0)

        def drain(inf):
            kind, group, stacked, fut, gcap = inf
            rows = fut.result()
            if kind == "raw":
                if rows.ndim == 1:
                    rows = rows[None]
                for (i, codes, caps, _res), row in zip(group, rows):
                    yield self._pairs_collect(i, codes, caps, row)
                return
            g = len(group)
            caps = group[0][2][1:]
            npt = rows[:g]
            nst = rows[g : 2 * g]
            cnt = np.minimum(npt, caps[0])
            if int(cnt.sum()) > gcap:
                type(self)._my_gcap = max(
                    gcap, 1 << (int(cnt.sum()) - 1).bit_length())
                full = np.asarray(jax.device_get(stacked))
                for (i, codes, capsr, _res), row in zip(group, full):
                    yield self._pairs_collect(i, codes, capsr, row)
                return
            offs = np.zeros(g + 1, np.int64)
            offs[1:] = np.cumsum(cnt)
            pos_sec = rows[2 * g : 2 * g + gcap]
            mask_sec = rows[2 * g + gcap :]
            for gi, (i, codes, capsr, _res) in enumerate(group):
                if npt[gi] > caps[0] or nst[gi] > caps[1]:
                    cls = type(self)
                    cls._my_pairs = max(
                        caps[0],
                        1 << (max(int(npt[gi]), 1) - 1).bit_length())
                    cls._my_slots = max(
                        caps[1],
                        1 << (max(int(nst[gi]), 1) - 1).bit_length())
                    yield (i,) + self._myers_pairs(codes)
                    continue
                pos = pos_sec[offs[gi] : offs[gi + 1]].astype(np.int64)
                mask = mask_sec[offs[gi] : offs[gi + 1]].astype(np.int64)
                yield (i,) + self._myers_pairs_from(pos, mask)

        for i, codes in enumerate(blocks):
            if self.myers_available(len(codes)):
                caps = ("my", self._my_pairs, self._my_slots)
                res, _kout = self._myers_dispatch(codes, caps[1:])
            else:
                caps = ("dp", self._sout_cap, self._soflow_cap)
                res = self._pairs_dispatch(codes, caps[1:])
            pend.append((i, codes, caps, res))
            if len(pend) >= depth:
                if inflight is not None:
                    yield from drain(inflight)
                inflight = launch(max(depth // 2, 1))
        while inflight is not None or pend:
            if inflight is not None:
                yield from drain(inflight)
                inflight = None
            if pend:
                inflight = launch(len(pend))

    _pool = None

    def _pairs_collect(self, i, codes, caps, packed):
        kind, caps = caps[0], caps[1:]
        if kind == "my":
            npairs, nslots = int(packed[0]), int(packed[1])
            if npairs > caps[0] or nslots > caps[1]:
                # overflow: redo solo (grows the sticky class caps; the
                # epilogue-only retry path lives in _myers_pairs)
                cls = type(self)
                cls._my_pairs = max(
                    caps[0], 1 << (max(npairs, 1) - 1).bit_length())
                cls._my_slots = max(
                    caps[1], 1 << (max(nslots, 1) - 1).bit_length())
                return (i,) + self._myers_pairs(codes)
            return (i,) + self._myers_decode(packed, caps)
        total, oflow = int(packed[0]), int(packed[1])
        if total > caps[0] or oflow > caps[1]:
            cls = type(self)
            cls._sout_cap = max(
                caps[0], 1 << (max(total, 1) - 1).bit_length())
            cls._soflow_cap = max(
                caps[1], 1 << (max(oflow, 1) - 1).bit_length())
            return (i,) + self.scan_pairs(codes)
        return (i,) + self._pairs_decode(packed, codes, caps)

    def scan_pairs(self, codes: np.ndarray):
        """(ends [M] int64, pids [M] int64) — the full Sellers candidate
        set {(b, p): mindist(b, p) <= k}, UNORDERED.  Via the Myers
        bit-parallel kernel when eligible (every hitting pattern rides
        the per-position mask — no multi-pattern escapes at all), else
        the row-DP Mosaic kernel: per-position hit counts + top pattern
        compact in-kernel; positions where several patterns fire (or
        whose per-row slots overflowed) are re-solved by the exact numpy
        DP (:meth:`rescan_boundaries`).  Candidate set identical to
        :meth:`scan`'s."""
        if self.myers_available(len(codes)):
            self._route("Myers bit-parallel k-edit kernel "
                        "(packed pattern pairs)")
            return self._myers_pairs(codes)
        self._route("row-DP Sellers Mosaic kernel")
        cls = type(self)
        while True:
            caps = (self._sout_cap, self._soflow_cap)
            res = self._pairs_dispatch(codes, caps)
            packed = np.asarray(jax.device_get(res))
            total, oflow = int(packed[0]), int(packed[1])
            if total <= caps[0] and oflow <= caps[1]:
                break
            cls._sout_cap = max(
                caps[0], 1 << (max(total, 1) - 1).bit_length())
            cls._soflow_cap = max(
                caps[1], 1 << (max(oflow, 1) - 1).bit_length())
        return self._pairs_decode(packed, codes, caps)

    def _pairs_decode(self, packed, codes, caps):
        t = self.tables
        n = len(codes)
        oc, ofc = caps
        total, oflow = int(packed[0]), int(packed[1])
        pos = packed[2 : 2 + total].astype(np.int64)
        meta = packed[2 + oc : 2 + oc + total]
        live = pos < n  # pad segments beyond the array never fire, but
        pos, meta = pos[live], meta[live]
        cnt = meta & 255
        single = cnt == 1
        rows = packed[2 + 2 * oc : 2 + 2 * oc + oflow]
        if oflow:
            # overflowed rows are rescanned whole: drop their kept slots
            single &= ~np.isin(pos // SEG, rows.astype(np.int64))
        ends = pos[single] + 1
        pids = ((meta[single] >> 8) & 127).astype(np.int64)
        multi = [pos[~single & (cnt >= 1)]]
        for r0 in rows:
            base = int(r0) * SEG
            multi.append(np.arange(base, min(base + SEG, n),
                                   dtype=np.int64))
        multi = np.concatenate(multi)
        if len(multi):
            rb, rp = self.rescan_boundaries(codes, multi)
            ends = np.concatenate([ends, rb + 1])
            pids = np.concatenate([pids, rp])
        return ends, pids

    def rescan_boundaries(self, codes: np.ndarray, starts):
        """Exact numpy Sellers at specific boundary starts: returns
        (starts, pids) for every pattern with mindist(start + 1, p) <= k
        — the kernel path's multi-pattern / overflow escape."""
        t = self.tables
        k = self.k
        n = len(codes)
        starts = np.unique(np.asarray(starts, np.int64))
        if not len(starts):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        # W - k extra columns of left margin keep the truncated nrun and
        # free-start exact for every path reaching the last column (a
        # <= k-edit alignment consumes <= Lmax + k text chars)
        W = t.Lmax + 2 * k + 1
        pad = np.full(W, t.eos_code, np.uint8)
        ext = np.concatenate([pad, np.asarray(codes, np.uint8)])
        # window text[i-W+1 .. i] for boundary start i (ext offset +W)
        wins = ext[starts[:, None] + 1 + np.arange(W)]
        INF = k + 1
        M = len(starts)
        nrun = np.zeros((M, W), np.int64)
        run = np.zeros(M, np.int64)
        for c in range(W):
            run = np.where(wins[:, c] == t.eos_code, 0, run + 1)
            nrun[:, c] = run
        D = np.zeros((M, t.P, W), np.int32)
        m3 = t.match.transpose(1, 2, 0)  # [Lmax, alpha, P]
        at_eos = (nrun == 0)[:, None, :]
        for j in range(t.Lmax):
            ok = m3[j, wins, :].transpose(0, 2, 1)  # [M, P, W]
            sub = np.where(ok, 0, 1)
            diag = np.concatenate(
                [np.full((M, t.P, 1), INF, np.int32), D[:, :, :-1]],
                axis=2)
            base = np.where(at_eos, INF, diag + sub)
            if self.indels:
                base = np.minimum(base, np.where(at_eos, INF, D + 1))
            base = np.minimum(base, INF)
            out = base
            if self.indels:
                for tt in range(1, k + 1):
                    sh = np.concatenate(
                        [np.full((M, t.P, tt), INF, np.int32),
                         base[:, :, :-tt]], axis=2)
                    out = np.minimum(
                        out, np.where((nrun >= tt)[:, None, :],
                                      sh + tt, INF))
            active = (j < t.lengths)[None, :, None]
            D = np.where(active, np.minimum(out, INF), D)
        hit = D[:, :, W - 1] <= k  # [M, P]
        mi, pi = np.nonzero(hit)
        return starts[mi], pi.astype(np.int64)

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
        # explicit pin only: auto host routing happens at the filter
        # engine (the XLA block DP below stays the parity oracle for the
        # kernel tests)
        if self.use_host is True and self._host_eligible(len(codes)):
            self._route("native Sellers row machine (host)")
            ends, pids, dist = self._host_scanner.pairs(np.asarray(codes))
            order = np.lexsort((pids, ends))
            for i in order:
                yield int(ends[i]), int(pids[i]), int(dist[i])
            if self.progress:
                self.progress(1.0)
            return
        t = self.tables
        self._route("XLA Sellers block DP (Lmax=%d, P=%d, k=%d)"
                    % (t.Lmax, t.P, self.k))
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
