"""Pallas TPU scan kernel: multi-pattern one-hot correlation on the MXU.

This is the hot loop of every exact / k-mismatch scan (the reference walks an
Aho-Corasick automaton or shift-and bitvectors one char at a time,
``keyword_tree.t:427-486``, ``shift_and.cc:218-254``).  TPU-native design:

    score(t, p) = sum_j [ text[t+j] accepted at pattern p position j ]

evaluated transposed — positions on lanes — so the im2col matrix is built in
VMEM from nothing but static lane-slices of the raw code row and never
touches HBM:

    Yt[m, t] = (codes[t + m % Lmax] == m // Lmax)        (K x T, int8)
    scoresT  = sum_chunks  Wt[:, chunk] @ Yt_chunk       (P x T, int8 MXU)

Per T-position tile the only HBM traffic is the [1, T + HALO] code row
(int32) and a [1, T // MB] microblock-count row out: ~4 bytes/base total.
Hits are folded in-kernel to MB-position microblock candidate counts; the
caller re-scores only the (rare) nonzero microblocks through the exact XLA
path to recover (end, pattern, mismatches) tuples — a two-level filter in
the spirit of the reference's filter->verify pipelines, at compute speed.

EOS / entry-boundary semantics ride in the weights (poison rows), identical
to :func:`..tables.conv_weights`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
HALO = 128  # right halo per tile; bounds Lmax - 1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# class markers >= BITCLS mean "indicator plane = bit (c - BITCLS) of
# the (recoded) text byte" instead of "text byte == c": the wide-alphabet
# IUPAC bit-plane mode (ConvScanner._bitplane_mode) recodes the resident
# text to 4-bit base masks and scans 4 bit-planes instead of ~14 class
# planes — a SUPERSET filter (margins count |text_set ∩ pattern_set|,
# >= L for every true hit), resolved by the exact in-pipeline rescore.
BITCLS = 256


def _class_plane(blk, c, et):
    """Indicator plane for class marker ``c`` over a widened text block
    (int32): equality for real codes, a bit test for BITCLS markers."""
    if c >= BITCLS:
        return ((blk >> (c - BITCLS)) & 1).astype(et)
    return (blk == c).astype(et)


def kernel_weights(tables, k: int, poison_eos: bool, fold: bool = True,
                   bitw=None):
    """(W8 [8*PPAD, KPAD] int8, thr8 [8*PPAD, 1] int32, classes tuple).

    With ``fold=False`` the base-class fold below is skipped: margins are
    then EXACT (margin >= 0 <=> the window is a true scan hit) whenever
    the raw weights are 0/1 with poison, every threshold fits int8
    (max length - k <= 127) and Lmax <= HALO — the precondition of the
    in-kernel hit extraction (:func:`pallas_pos_words`), checked by
    :func:`pos_exact_ok`.  Folded weights are a SUPERSET filter only
    (codes with no one-hot plane score w(base) instead of 0).

    PHASE-TRANSPOSED weight layout for :func:`pallas_microhits`: the text
    is scanned as a [8, n/8] block (sublane r holds positions t with
    t % 8 == r), so the one-hot of each text position is computed ONCE
    (the previous sheared layout re-compared every position 8 times) and
    the im2col assembles from lane-ALIGNED block copies.

    M axis (score rows): m = p*8 + r — pattern-major so the reduce tree
    halves over patterns while keeping the 8 phases as the final rows.
    K axis: col = (ci*na + a)*8 + bp encodes "the text value at sublane
    bp, lane u + a" where for score row (p, r) and pattern offset j
    (j = 8*a0 + b0): bp = (r + b0) % 8 and a = a0 + (r + b0) // 8 — each
    (r, bp, a) determines j uniquely, so W8[p*8 + r, (ci*na + a)*8 + bp]
    = w[j, classes[ci], p].  na = (Lmax-1)//8 + 2 lane offsets suffice.

    The LAST live K column (index K-1) is a BIAS lane: the kernel keeps a
    constant ones-row there and the weight is -threshold[p] (pad pattern
    rows get -1), so the matmul emits margin = score - threshold and the
    hit test is a sign check — no per-pattern threshold broadcast, and
    the occupancy reduce can run as an int32 max tree BEFORE any compare.
    -threshold clips to int8 at -127: only reachable when threshold =
    128 (a 128-long pattern with an empty base fold), where the filter
    admits score-127 windows too — candidates are only ADDED.

    Only LIVE classes (any nonzero weight) get one-hot planes; the EOS
    poison clamps to -127, which still sinks any window margin below 0:
    one poisoned position bounds the score by Lmax - 1 - 126 <= 0 <
    threshold (Lmax <= HALO = 128).

    int8 (not bf16): the v5e MXU multiplies int8 natively with an int32
    accumulator, and the one-hot build writes half the bytes."""
    from ..tables import conv_weights

    if bitw is not None:
        # bit-plane mode: ``bitw = (wbit [L, NB, P], bitcls)`` from
        # ConvScanner._bitplane_mode — weights indexed by BIT rather
        # than class, no base fold (bit planes don't partition unity).
        # An optional third element overrides the per-pattern filter
        # thresholds (the exact class-ENCODE mode's margins peak at the
        # pattern's 1-bit count, not its length).
        bit_thr = None
        if len(bitw) == 3:
            w, classes, bit_thr = bitw
        else:
            w, classes = bitw
        w = np.asarray(w, np.float32)
        Lmax, alpha, P = w.shape
        fold = False
    else:
        bit_thr = None
        w = conv_weights(tables, k, poison_eos).astype(
            np.float32)  # [L, A, P]
        Lmax, alpha, P = w.shape
        classes = tuple(c for c in range(alpha) if np.any(w[:, c, :]))
        if not classes:
            classes = (0,)
    # BASE-CLASS FOLD: subtract one nonnegative class column from every
    # class and add its per-pattern total to the score via the threshold
    # instead — the folded class needs no compare pass and no im2col
    # copies in the kernel (one of four passes for DNA).  Exactness: for
    # text code c with a plane, score is unchanged (adj + base = w); for
    # the base code itself, exactly base = w(base); for codes with NO
    # plane (EOS, N, dead classes), the filter scores w(base) >= 0
    # instead of the true 0 — candidates can only be ADDED (the exact
    # rescore in pallas_scan_hits rejects them), never lost.  Skipped
    # when every class column has negatives (then no base is safe) or
    # only one class is live.
    base_cls = None if (not fold or bitw is not None) else next(
        (c for c in classes if np.all(w[:, c, :] >= 0)), None)
    if base_cls is not None and len(classes) > 1:
        base_col = w[:, base_cls, :].copy()  # [L, P]
        w = w - base_col[:, None, :]
        base_tot = base_col.sum(axis=0)  # [P]
        classes = tuple(c for c in classes if c != base_cls)
    else:
        base_tot = np.zeros((P,), np.float32)
    nc = len(classes)
    # ci-aligned weight planes: bitw columns are already in classes
    # order; real classes index the alphabet axis by value
    wsel = w if bitw is not None else np.stack(
        [w[:, c, :] for c in classes], axis=1)  # [L, nc, P]
    na = _na(Lmax)
    K = nc * 8 * na + 1  # + bias lane
    KPAD = _round_up(K, LANE)
    PPAD = _round_up(max(P, 1), LANE)
    W8 = np.zeros((8 * PPAD, KPAD), dtype=np.float32)
    prow = np.arange(P) * 8
    for ci in range(nc):
        for r in range(8):
            for b0 in range(8):
                bp = (r + b0) % 8
                g = (r + b0) // 8
                for a0 in range((Lmax - 1 - b0) // 8 + 1 if b0 < Lmax
                                else 0):
                    j = 8 * a0 + b0
                    col = (ci * na + (a0 + g)) * 8 + bp
                    W8[prow + r, col] = wsel[j, ci, :]
    if bit_thr is not None:
        thr = np.asarray(bit_thr, np.int64)
    else:
        thr = np.round(
            tables.lengths.astype(np.float64) - int(k) - base_tot
        ).astype(np.int64)
    bias = np.full((8 * PPAD,), -1.0, dtype=np.float32)
    for r in range(8):
        bias[prow + r] = -thr
    W8[:, K - 1] = bias
    thr8 = np.full((8 * PPAD, 1), 1 << 30, dtype=np.int32)
    for r in range(8):
        thr8[prow + r, 0] = thr
    return np.clip(W8, -127, 127).astype(np.int8), thr8, classes


def _na(Lmax: int) -> int:
    """Lane offsets needed per class plane: with j = 8*a0 + b0 and the
    phase carry g in {0, 1}, a = a0 + g <= (Lmax - 1) // 8 + 1."""
    return (max(Lmax, 1) - 1) // 8 + 2


def _pattern_matmul_reduce(scores, mlive: int, U: int, et, wcol=None):
    """(cnt [8, U] int32, sid_sum [8, U] int32) from margins [mlive, U].

    The pattern-axis reduce as TWO tiny MXU matmuls instead of a VPU
    tree over the 8*plive rows (the tree was ~half the kernel's VPU
    time at plive = 128): with score row m = p*8 + r, the selection
    matrix S[r, m] = (r == m % 8) contracts the pattern axis while
    keeping the phase rows, so

        cnt     = S @ [score >= 0]          (hits per position)
        sid_sum = S @ (pid * [score >= 0])  (sum of hitting pattern ids)

    For cnt == 1 positions the sum IS the hitting pattern id; multi-hit
    positions carry the SUM, which keys the static prefix-chain table
    (two exact patterns co-matching at one start are prefix-nested, so
    the matcher set is determined by any injective-enough key — see
    conv_scan._chain_table) or escape to an exact host rescan.  int8
    operands are exact: pid <= plive - 1 <= 127 and the int32
    accumulator carries the sums.

    ``wcol`` (optional, [mlive, 1] int8) replaces the id contributions
    with per-pattern WEIGHTS — a permutation of 0..plive-1 chosen by
    the host so that chain keys are injective (a plain id sum collides
    whenever two same-size chains share a total).

    The weights FOLD INTO the selection matrix (S_w[r, m] = w[m] at
    r == m % 8): both reductions then contract the same single hit
    plane — the old ``x_sid = where(hit, pw, 0)`` built and re-read a
    second [mlive, U] operand plane per tile, a pure VPU-traffic loss
    (ids/weights <= 127 stay exact in int8 either way).  ``wcol`` here
    is that matrix, prebuilt host-side ([8, mlive] int8 slice of the
    kernel input — building it in-kernel would need a sublane<->lane
    transpose of the weight column)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, mlive), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, mlive), 1)
    sel = ri == (ci & 7)
    S = sel.astype(et)
    if wcol is None:
        Sw = jnp.where(sel, ci >> 3, 0).astype(et)
    else:
        Sw = wcol
    hit8 = (scores >= 0).astype(et)
    cnt = jnp.dot(S, hit8, preferred_element_type=jnp.int32)
    sm = jnp.dot(Sw, hit8, preferred_element_type=jnp.int32)
    return cnt, sm


def _scan_kernel(codes_ref, next_ref, wt_ref, *refs,
                 classes: tuple, U: int, na: int, kchunks: int,
                 plive: int, ptiles: int, emit: str,
                 use_feed: bool = False, use_ohp: bool = False):
    # codes_ref/next_ref: [1, 8, U] uint8 (phase-transposed text tiles i
    # and i+1 of the SAME padded array — sublane r, lane u is position
    # t = 8*(i*U + u) + r; the lane halo is read in-kernel from the next
    # tile); wt_ref: [1, kchunks, 8*LANE, LANE] (this grid step's pattern
    # tile); out_ref: [1, 1, 8, U]
    """One tile: phase-transposed text -> per-(phase, position) hits.

    Every text position's one-hot is computed ONCE (one compare per live
    class on the [8, U + na - 1] block), and the im2col lands as na
    lane-ALIGNED [8, U] block copies per class:

        Yt[(ci*na + a)*8 + bp, u] = oh[ci*8 + bp, u + a]

    The matmul contracts the (class, lane-offset, phase) axis against
    :func:`kernel_weights`' phase-expanded weights, emitting int32
    MARGINS (score - threshold rides the bias lane) for all 8 phases of
    plive patterns: [8*plive, U].  The reduce tree halves over patterns
    (pattern-major row order keeps phases aligned), as int32 max when
    only occupancy is needed — the sign check then runs on the final
    [8, U] block — or as a bf16 count sum after a sign check otherwise.
    A sublane ``jnp.sum`` stalls the Mosaic compiler; the microblock
    lane-group reduce happens OUTSIDE the kernel as an XLA reshape.

    Scratch reuse across the grid (TPU grids run sequentially,
    pattern-tile axis innermost): the bias ones-row and the K-pad zero
    rows of ``yt`` are written once at the first step, and with several
    pattern tiles the im2col build runs only at pattern-tile 0.

    With ``use_feed`` the whole build is skipped: the operand arrives
    per tile from the precomputed HBM feed (:func:`imcol_transpose`) —
    the DMA overlaps the matmul/reduce where the in-kernel build
    serialized with them."""
    ohcur_ref = ohnext_ref = feed_ref = None
    if use_feed:
        feed_ref, out_ref, yt_ref, acc_ref, oh_ref = refs
    elif use_ohp:
        ohcur_ref, ohnext_ref, out_ref, yt_ref, acc_ref, oh_ref = refs
    else:
        out_ref, yt_ref, acc_ref, oh_ref = refs
    nc = len(classes)
    K = nc * 8 * na + 1
    KPAD = kchunks * LANE
    mlive = 8 * plive
    HU = na - 1
    # int8 operands, int32 margins: tpu.matmul requires a 32-bit
    # accumulator type on this target (bf16/int16 emission rejected), so
    # the margin max tree runs at full int32 width
    et = jnp.int8
    pet = jnp.int32

    if not use_feed:
        @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                 pl.program_id(1) == 0))
        def _():
            # static yt content, never written again: bias + K-pad zeros
            yt_ref[K - 1 : K, :] = jnp.ones((1, U), et)
            if K < KPAD:
                yt_ref[K:KPAD, :] = jnp.zeros((KPAD - K, U), et)

        def build():
            if use_ohp:
                # one-hot planes arrive precomputed (ohp_transpose):
                # only the lane-shifted im2col copies remain
                cur = ohcur_ref[0]
                nxt = ohnext_ref[0]
                for ci in range(nc):
                    for a in range(na):
                        row = (ci * na + a) * 8
                        if a == 0:
                            yt_ref[row : row + 8, :] = \
                                cur[ci * 8 : (ci + 1) * 8, :]
                        else:
                            yt_ref[row : row + 8, :] = jnp.concatenate(
                                [cur[ci * 8 : (ci + 1) * 8, a:],
                                 nxt[ci * 8 : (ci + 1) * 8, :a]], axis=1)
                return
            # widen once: int8/uint8 equality compares are unsupported
            # by this Mosaic target
            blk = jnp.concatenate(
                [codes_ref[0], next_ref[0][:, :HU]], axis=1
            ).astype(jnp.int32)
            for ci, c in enumerate(classes):
                oh_ref[ci * 8 : (ci + 1) * 8, :] = _class_plane(blk, c, et)
            for ci in range(nc):
                for a in range(na):
                    row = (ci * na + a) * 8
                    yt_ref[row : row + 8, :] = \
                        oh_ref[ci * 8 : (ci + 1) * 8, a : a + U]

        if ptiles == 1:
            build()
        else:
            # im2col depends only on the text tile; rebuild at tile 0
            @pl.when(pl.program_id(1) == 0)
            def _():
                build()

    def ysrc(lo, hi):
        return feed_ref[0][lo:hi] if use_feed else yt_ref[lo:hi]

    if kchunks == 1:
        scores = jnp.dot(wt_ref[0, 0, :mlive, :], ysrc(0, KPAD),
                         preferred_element_type=pet)
    else:
        # first chunk WRITES the accumulator (the former zero-fill was
        # a full [mlive, U] int32 pass per tile — ~5% of the
        # wide-alphabet kernel)
        acc_ref[:] = jnp.dot(
            wt_ref[0, 0, :mlive, :], ysrc(0, LANE),
            preferred_element_type=jnp.int32)
        for kc in range(1, kchunks):
            acc_ref[:] += jnp.dot(
                wt_ref[0, kc, :mlive, :],
                ysrc(kc * LANE, (kc + 1) * LANE),
                preferred_element_type=jnp.int32,
            )
        scores = acc_ref[:]

    def pattern_tree(s, op):
        # reduce the (pattern, phase) rows to the 8 phase rows; plive is
        # the EXACT live pattern count (not a power of two — pad rows
        # would cost tree work), so odd counts peel one 8-row block into
        # the head; every slice stays 8-row aligned.  The occupancy /
        # counts emits keep this VPU tree: at small plive it beats the
        # matmul reduce's fixed costs (the matmul swap cost the exact
        # headline ~10%), and neither needs the pos path's id-SUM key.
        r = plive
        while r > 1:
            if r % 2:
                s = jnp.concatenate(
                    [op(s[:8, :], s[(r - 1) * 8 : r * 8, :]),
                     s[8 : (r - 1) * 8, :]], axis=0)
                r -= 1
            else:
                r //= 2
                s = op(s[: r * 8, :], s[r * 8 : 2 * r * 8, :])
        return s

    if emit == "occupancy":
        # margins: max over patterns first, sign check last
        s = pattern_tree(scores, jnp.maximum)
        out_ref[0, 0] = (s >= 0).astype(jnp.bfloat16)
        return
    if emit == "counts":
        # per-(phase, position) hit counts <= P <= 128: exact in bf16
        hit = (scores >= 0).astype(jnp.bfloat16)
        out_ref[0, 0] = pattern_tree(hit, jnp.add)
        return
    # emit == "pos": packed per-position (sid sum, hit count)
    cnt, sm = _pattern_matmul_reduce(scores, mlive, U, et)
    # EXACT in-kernel hit extraction (requires unfolded weights, see
    # :func:`pos_exact_ok`): per position, the number of patterns
    # whose window starting there is a true hit and the SUM of their
    # pattern ids, packed as (sid_sum << 8) | cnt (no hit -> -256).
    # When cnt == 1 the sum IS the pattern id; multi-hit positions
    # resolve through the sum-keyed static chain table or escape to
    # the exact host rescan.  The host consumes candidates straight
    # from this word — no second-level rescore pass exists in this
    # mode.
    out_ref[0, 0] = jnp.where(
        cnt > 0, (sm << 8) | jnp.minimum(cnt, 255), jnp.int32(-256))


def phase_transpose(codes, T: int = 8192):
    """Phase-transposed device form of a flat code array: [ntiles + 1, 8,
    T // 8] uint8 where tile i, sublane r, lane u holds position
    t = T*i + 8*u + r (one extra all-pad tile for the kernel's lane-halo
    read).  This is the scan-resident DB representation — the transpose
    is byte-shuffle-bound (~10 GB/s on this backend however it is
    spelled: XLA transpose, Mosaic relayout, and u32 byte extraction all
    measure the same or worse), so it is computed ONCE per uploaded
    array (compress_seq-style preprocessing) rather than per scan."""
    if T % 8:
        raise ValueError("T must be a multiple of 8")
    U = T // 8
    codes = codes.astype(jnp.uint8)
    n = codes.shape[0]
    ntiles = max((n + T - 1) // T, 1)
    padded = jnp.concatenate(
        [codes, jnp.zeros((ntiles + 1) * T - n, jnp.uint8)]
    )
    return padded.reshape(ntiles + 1, U, 8).transpose(0, 2, 1)


_phase_transpose_jit = jax.jit(phase_transpose, static_argnames=("T",))


@functools.partial(jax.jit, static_argnames=("T", "classes"))
def ohp_transpose(codes, *, T: int, classes: tuple):
    """Phase-transposed one-hot class planes: [ntiles + 1, 8 * nc, U]
    int8 with rows ci*8 + bp holding ``codes[T*i + 8*u + bp] ==
    classes[ci]`` — exactly the ``oh_ref`` content the exact scan kernel
    otherwise computes per tile (an int32 widen + one compare pass per
    class, its measured VPU bound).  nc bytes/base of HBM vs 16 for the
    full im2col feed (whose DMA the exact kernel could not hide); the
    lane-shifted im2col copies stay in-kernel.  One trailing all-pad
    tile serves the lane halo, like :func:`phase_transpose`."""
    U = T // 8
    nc = len(classes)
    n = codes.shape[0]
    ntiles = max((n + T - 1) // T, 1)
    ext = jnp.concatenate([
        codes.astype(jnp.int32),
        jnp.zeros((ntiles + 1) * T - n, jnp.int32),
    ])
    rows = []
    for c in classes:
        for bp in range(8):
            pl = ext[bp::8]
            rows.append(((pl >> (c - BITCLS)) & 1) > 0 if c >= BITCLS
                        else pl == c)
    m = jnp.stack(rows, axis=0).astype(jnp.int8)  # [8nc, (nt+1)*U]
    return m.reshape(8 * nc, ntiles + 1, U).transpose(1, 0, 2)


@functools.partial(
    jax.jit, static_argnames=("T", "classes", "na", "KPAD"))
def imcol_transpose(codes, *, T: int, classes: tuple, na: int, KPAD: int):
    """Precomputed im2col feed: [ntiles, KPAD, T // 8] int8 where row
    (ci*na + a)*8 + bp, lane u of tile i holds
    ``codes[T*i + 8*(u + a) + bp] == classes[ci]`` — exactly the ``yt``
    operand the scan kernels otherwise build in VMEM per tile (compare
    passes + lane-shifted block copies, the measured VPU bound of the
    exact scan, see README roofline).  Row K-1 = the bias ones-row,
    rows K..KPAD zero.  Built ONCE per resident DB + class geometry
    (compress_seq-style preprocessing, ~KPAD/8 bytes/base of HBM): the
    kernel then reads its operand straight from HBM — DMA overlaps the
    matmul/reduce compute, where the in-kernel build serialized with it.

    The class-plane rows are the strided byte planes of the SHIFTED code
    array, so the whole build is XLA slices + compares (no gathers)."""
    U = T // 8
    nc = len(classes)
    K = nc * 8 * na + 1
    if K > KPAD:
        raise ValueError(f"K {K} exceeds KPAD {KPAD}")
    n = codes.shape[0]
    ntiles = max((n + T - 1) // T, 1)
    ext = jnp.concatenate([
        codes.astype(jnp.int32),
        jnp.zeros(ntiles * T + 8 * na - n, jnp.int32),
    ])
    rows = []
    for c in classes:
        for a in range(na):
            for bp in range(8):
                b0 = 8 * a + bp
                pl = ext[b0 : b0 + ntiles * T : 8]
                rows.append(((pl >> (c - BITCLS)) & 1) > 0 if c >= BITCLS
                            else pl == c)
    m = jnp.stack(rows, axis=0).astype(jnp.int8)  # [K-1, ntiles*U]
    bias = jnp.ones((1, ntiles * U), jnp.int8)
    pad = jnp.zeros((KPAD - K, ntiles * U), jnp.int8)
    yt = jnp.concatenate([m, bias, pad], axis=0)
    return yt.reshape(KPAD, ntiles, U).transpose(1, 0, 2)


@functools.partial(
    jax.jit,
    static_argnames=("classes", "Lmax", "T", "MB", "interpret", "n_pat",
                     "occupancy"),
)
def pallas_microhits(codes, W, thr, *, classes: tuple, Lmax: int,
                     T: int = 8192, MB: int = 32, interpret: bool = False,
                     n_pat: int | None = None, occupancy: bool = False,
                     t3=None):
    return _kernel_out(codes, W, thr, classes=classes, Lmax=Lmax, T=T,
                       MB=MB, interpret=interpret, n_pat=n_pat,
                       emit="occupancy" if occupancy else "counts", t3=t3)


def _kernel_out(codes, W, thr, *, classes: tuple, Lmax: int,
                T: int = 8192, MB: int = 32, interpret: bool = False,
                n_pat: int | None = None, emit: str = "counts",
                t3=None, feed=None, ohp=None):
    """Microblock candidate counts over the whole code array.

    codes: [n] uint8/int device array (EOS-padded is fine).
    W, thr: from :func:`kernel_weights` (thr is informational — the
    thresholds ride W's bias lane).
    classes: live alphabet class codes (from :func:`kernel_weights`).
    T: positions per kernel tile (the phase-transposed tile is [8, T/8]).
    n_pat: number of REAL patterns in W (rest are pad); single-tile
    kernels restrict their VPU work to the next power of two of this.
    t3: optional precomputed :func:`phase_transpose`(codes, T) — the
    transpose costs ~3x the kernel, so scan-many workloads pass the
    cached form.
    Returns counts [ntiles * T // MB] f32 — number of (window-start, pattern)
    hits whose start position falls in each MB-position microblock — or,
    with ``emit="occupancy"``, a bool occupancy mask of the same shape
    (cheaper: the kernel reduces int32 margins by max and the microblock
    reduce is a bf16 max) — or, with ``emit="pos"``, the RAW
    [ntiles, ptiles, 8, U] int32 packed per-position words
    ((sid_sum << 8) | cnt; -256 where no pattern hits; position
    t = T*i + 8*u + r at [i, :, r, u]; for cnt == 1 the sum is the
    hitting pattern id) — exact hit extraction with NO rescore, valid
    only under :func:`pos_exact_ok` weights.
    """
    del thr  # thresholds are baked into W's bias lane
    if Lmax > HALO:
        raise NotImplementedError(f"Lmax {Lmax} exceeds kernel halo {HALO}")
    if T % 8 or MB % 8:
        raise ValueError("T and MB must be multiples of 8")
    U = T // 8
    G = MB // 8
    na = _na(Lmax)
    n = codes.shape[0]
    ntiles = max((n + T - 1) // T, 1)
    Mrows = W.shape[0]
    ptiles = Mrows // (8 * LANE)
    kchunks = W.shape[1] // LANE
    if ptiles == 1 and n_pat is not None:
        # exact count (NOT a power of two): the matmul M axis and the
        # pattern reduce tree pay for every row, pad or not
        plive = min(max(n_pat, 1), LANE)
    else:
        plive = LANE
    if t3 is None:
        t3 = phase_transpose(codes, T)

    W4 = W.reshape(ptiles, 8 * LANE, kchunks, LANE).swapaxes(1, 2)
    et = jnp.int8

    in_specs = [
        pl.BlockSpec((1, 8, U), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, U), lambda i, j: (i + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kchunks, 8 * LANE, LANE),
                     lambda i, j: (j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [t3, t3, W4]
    if feed is not None:
        in_specs.append(pl.BlockSpec(
            (1, kchunks * LANE, U), lambda i, j: (i, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(feed)
    elif ohp is not None:
        nc8 = 8 * len(classes)
        in_specs += [
            pl.BlockSpec((1, nc8, U), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc8, U), lambda i, j: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [ohp, ohp]

    out = pl.pallas_call(
        functools.partial(
            _scan_kernel, classes=classes, U=U, na=na, kchunks=kchunks,
            plive=plive, ptiles=ptiles, emit=emit,
            use_feed=feed is not None, use_ohp=ohp is not None,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ntiles, ptiles, 8, U),
            jnp.int32 if emit == "pos" else jnp.bfloat16),
        grid=(ntiles, ptiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 8, U), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # with an HBM feed the build scratches shrink to dummies
            pltpu.VMEM((kchunks * LANE, U) if feed is None else (8, LANE),
                       et),
            # single-chunk kernels feed the matmul output straight into
            # the reduce; the accumulator scratch shrinks to a dummy tile
            pltpu.VMEM((8 * plive, U) if kchunks > 1 else (8, LANE),
                       jnp.int32),
            pltpu.VMEM((8 * len(classes), U + na - 1)
                       if feed is None and ohp is None
                       else (8, LANE), et),
        ],
        interpret=interpret,
    )(*args)
    if emit == "pos":
        return out
    # microblock m covers positions [MB*m, MB*(m+1)) = all 8 phases of G
    # consecutive lanes; reduce pattern tiles + phases, then lane groups
    if emit == "occupancy":
        o = out.reshape(ntiles, ptiles * 8, U).max(axis=1)
        return (o.reshape(ntiles, U // G, G).max(axis=2).reshape(-1) > 0)
    c = out.astype(jnp.float32).reshape(ntiles, ptiles * 8, U).sum(axis=1)
    return c.reshape(ntiles, U // G, G).sum(axis=2).reshape(-1)


def _microhits_impl(codes, W, thr, *, classes, Lmax, T, MB, interpret,
                    n_pat=None, occupancy=False, t3=None, feed=None,
                    ohp=None):
    """Non-jitted body of :func:`pallas_microhits` for fusion into larger
    jitted pipelines."""
    return _kernel_out(
        codes, W, thr, classes=classes, Lmax=Lmax, T=T, MB=MB,
        interpret=interpret, n_pat=n_pat,
        emit="occupancy" if occupancy else "counts", t3=t3, feed=feed,
        ohp=ohp,
    )


# ---------------------------------------------------------------------------
# in-kernel hit-stream extraction: the "slots" pipeline
#
# The pos-words mode still leaves the EXTRACTION of the ~0.2%-dense hit
# stream to XLA (compaction + gather), which costs tens of ms per 16 MB on
# this backend — more than 20x the scan kernel itself.  The slots kernel
# extracts hits IN-KERNEL: per (tile, phase row) the hit positions are
# ranked by a lane prefix-sum and routed to the row front by a bit-serial
# shift network, emitting a compacted [8, SLOT_CAP] block of packed hit
# metadata plus the 4-bit-packed text WINDOW around each hit (so the
# downstream extension gate never touches the text again).  The XLA
# epilogue handles only a few thousand compact slots.
#
# Shift-network correctness (LSB->MSB strides): after processing strides
# 1..2^(j-1), every element's remaining displacement d is divisible by
# 2^j.  At stride 2^j, a mover (bit j of d set) lands on a stationary
# element only if their displacements differ by less than 2^j — but
# mover d ≡ 2^j and stayer d ≡ 0 (mod 2^(j+1)) forces a difference of at
# least 2^j.  Contradiction: every landing lane is vacant (or a void,
# which never travels since its d is 0).

SLOT_CAP = 256  # compacted hits kept per (tile, phase row); excess rows escape
SLOT_WB = 8     # window codes kept LEFT of each hit position (1 lane).
# The gate reads at most LgT + band codes left of the anchor (rmatch
# walks from pstart - 1), so 8 suffices at the LgT <= 6 clamp — and with
# the 12-code packed-window planes the whole gate window then fits
# NW = 2 planes (8 left + 9 seed + 6 LgT + 1 band = 24): one fewer
# plane through the in-kernel compaction network, which is the gated
# pipeline's dominant VPU cost (measured ~0.25 ms/16 MB at k=1).


def slot_cpp(wbits: int) -> int:
    """Window codes packed per int32 plane: one code fewer than the bit
    budget allows for 2-bit packs, keeping bits 30-31 clear (sign-bit
    shifts miscompile on this Mosaic target)."""
    return 15 if wbits == 2 else 32 // wbits


def _row_compact(planes, hit, rowcnt, U: int, cap: int):
    """Route each row's hits to its front lanes (rank order), in place on
    a list of int32 [8, U] payload planes.  Returns the compacted planes
    with void lanes zeroed.  ``hit`` bool [8, U]; ``rowcnt`` [8, 1]
    (unused — kept for signature stability; stale-copy cleanup uses the
    d == 0 finality test, see :func:`_seg_compact`)."""
    del rowcnt
    li = jax.lax.broadcasted_iota(jnp.int32, (8, U), 1)
    hit32 = hit.astype(jnp.int32)
    # inclusive lane prefix sum per row (Hillis-Steele)
    p = hit32
    s = 1
    while s < U:
        p = p + jnp.where(li >= s, pltpu.roll(p, shift=s, axis=1), 0)
        s *= 2
    rank = p - hit32
    keep = hit & (rank < cap)
    d = jnp.where(keep, li - rank, 0)
    planes = [jnp.where(keep, x, 0) for x in planes]
    s = 1
    while s < U:
        dm = pltpu.roll(d, shift=U - s, axis=1)  # candidate from lane u+s
        take = ((dm & s) != 0) & (li < U - s)
        d = jnp.where(take, dm - s, d)
        planes = [
            jnp.where(take, pltpu.roll(x, shift=U - s, axis=1), x)
            for x in planes
        ]
        s *= 2
    fin = d == 0
    return [jnp.where(fin, x, 0) for x in planes]


WPACK_CPP = 12     # codes per int32 in the packed-window form (2-bit)
WPACK_EOSBIT = 24  # bit: any EOS within [p, p + 16)


@functools.partial(jax.jit, static_argnames=("T", "eos"))
def wpack_transpose(codes, T: int, eos: int):
    """Phase-transposed PACKED-WINDOW form of a flat code array:
    [ntiles + 1, 8, T // 8] int32 where entry for position p packs
    ``codes[p + b] & 3`` at bits 2b (b < 12) plus an any-EOS-in-
    [p, p+16) flag at bit 24.  Built once per resident DB (cached like
    the phase transpose): the slots kernel then reads each 12-code
    window plane with ONE shear instead of 12 per-code shears, and the
    EOS-escape test is one bit test.  The 2-bit code alias (EOS -> 'A')
    is the usual pure gate relaxation."""
    U = T // 8
    codes = codes.astype(jnp.int32)
    n = codes.shape[0]
    ntiles = max((n + T - 1) // T, 1)
    pad = jnp.zeros(((ntiles + 1) * T - n) + 16, jnp.int32)
    ext = jnp.concatenate([codes, pad])
    # chained pack, highest offset first so code p+b lands at bits 2b
    w = jnp.zeros(((ntiles + 1) * T,), jnp.int32)
    for b in range(WPACK_CPP - 1, -1, -1):
        w = (w << 2) | (ext[b : b + (ntiles + 1) * T] & 3)
    ef = jnp.zeros(((ntiles + 1) * T,), jnp.bool_)
    em = ext == eos
    for b in range(16):
        ef = ef | em[b : b + (ntiles + 1) * T]
    w = w | (ef.astype(jnp.int32) << WPACK_EOSBIT)
    return w.reshape(ntiles + 1, U, 8).transpose(0, 2, 1)


def _seg_compact(planes, hit, U: int, segl: int, capg: int):
    """Segmented variant of :func:`_row_compact`: each ``segl``-lane
    segment of each row compacts to its own ``capg``-slot block —
    shorter shift networks (displacements bounded by the segment), and
    the packed [8, nsegs * capg] result assembles from STATIC slices of
    the segment fronts.  Returns (packed planes, p [8, U] — the
    inclusive per-segment hit prefix; its last lane per segment is the
    segment's TRUE hit count).

    Void cleanup rides the displacement plane: after the last stride, a
    lane holds a FINAL element iff d == 0 — a mover's source lane keeps
    its old d (bit ``s`` set, nonzero) when vacated, pre-zeroed voids
    start at d == 0, and every kept element's d reaches 0 at its
    destination.  The former per-lane segment-total backward max-fill
    (log2(segl) more stages over the full tile) is thereby dropped —
    measured at ~10% of the whole gated k=1 kernel."""
    li = jax.lax.broadcasted_iota(jnp.int32, (8, U), 1)
    lm = li & (segl - 1)
    hit32 = hit.astype(jnp.int32)
    p = hit32
    s = 1
    while s < segl:
        p = p + jnp.where(lm >= s, pltpu.roll(p, shift=s, axis=1), 0)
        s *= 2
    rank = p - hit32
    keep = hit & (rank < capg)
    d = jnp.where(keep, lm - rank, 0)
    planes = [jnp.where(keep, x, 0) for x in planes]
    s = 1
    while s < segl:
        dm = pltpu.roll(d, shift=U - s, axis=1)
        take = ((dm & s) != 0) & (lm < segl - s)
        d = jnp.where(take, dm - s, d)
        planes = [
            jnp.where(take, pltpu.roll(x, shift=U - s, axis=1), x)
            for x in planes
        ]
        s *= 2
    fin = d == 0
    planes = [jnp.where(fin, x, 0) for x in planes]
    nsegs = U // segl
    packed = [
        jnp.concatenate(
            [x[:, g * segl : g * segl + capg] for g in range(nsegs)],
            axis=1)
        for x in planes
    ]
    return packed, p


def _slots_kernel(prev_ref, codes_ref, next_ref, wt_ref, *refs,
                  classes: tuple, U: int, na: int, plive: int, NW: int,
                  cap: int, gate_cfg: tuple | None = None,
                  eos_esc: int = -1, Lmax: int = 0,
                  use_wpack: bool = False, use_wcol: bool = False,
                  ablate: str = "", fold: int = 1,
                  use_feed: bool = False):
    """Scan + in-kernel hit extraction for one text tile (kchunks == 1,
    ptiles == 1 — enforced by :func:`pallas_scan_slots`).

    Without ``gate_cfg`` emits ``slots_ref`` [1, 1 + NW, 8, cap] int32 —
    plane 0: packed meta ``(localpos << 15) | (min(sid_sum, 1023) << 5)
    | min(cnt, 31)`` (0 = empty slot; cnt >= 1 keeps hits nonzero; for
    cnt == 1 the sum IS the seed id), planes 1..NW:
    the text window codes ``codes[pstart - SLOT_WB + 8q .. +7]`` packed
    4 bits per code — and ``cnt_ref`` [1, 8, LANE] int32 (per-row TRUE
    hit count, broadcast along lanes; rows with count > cap overflow and
    must be escaped by the caller).

    With ``gate_cfg`` = (LgT, kk, band, indels, lens, T, n, Lmax) the
    extension gate (:func:`_gate_body`) runs IN THE SAME KERNEL on the
    compacted slots — the window planes never leave VMEM — emitting only
    the re-compacted survivor/escape meta [1, 8, cap] and a counts plane
    (lane 0: kept count, lane LANE//2: raw hit count for overflow
    detection)."""
    wprev_ref = wcur_ref = wnext_ref = wcol_ref = feed_ref = None
    if use_feed:
        feed_ref, *refs = refs  # inserted right after wt_ref by callers
    if use_wcol:
        wcol_ref, *refs = refs  # next after the feed
    if gate_cfg is None:
        slots_ref, cnt_ref, yt_ref, oh_ref = refs
        gt_ref = out_ref = ocnt_ref = None
    elif use_wpack:
        (gt_ref, wprev_ref, wcur_ref, wnext_ref, out_ref, ocnt_ref,
         yt_ref, oh_ref) = refs
    else:
        gt_ref, out_ref, ocnt_ref, yt_ref, oh_ref = refs
    nc = len(classes)
    K = nc * 8 * na + 1
    KPAD = LANE
    mlive = 8 * plive
    HU = na - 1
    et = jnp.int8

    if use_feed:
        yop = feed_ref[0]  # precomputed im2col tile (imcol_transpose)
    else:
        @pl.when(pl.program_id(0) == 0)
        def _():
            yt_ref[K - 1 : K, :] = jnp.ones((1, U), et)
            if K < KPAD:
                yt_ref[K:KPAD, :] = jnp.zeros((KPAD - K, U), et)

        blk = jnp.concatenate(
            [codes_ref[0], next_ref[0][:, :HU]], axis=1
        ).astype(jnp.int32)
        for ci, c in enumerate(classes):
            oh_ref[ci * 8 : (ci + 1) * 8, :] = (blk == c).astype(et)
        for ci in range(nc):
            for a in range(na):
                row = (ci * na + a) * 8
                yt_ref[row : row + 8, :] = \
                    oh_ref[ci * 8 : (ci + 1) * 8, a : a + U]
        yop = yt_ref[:]

    scores = jnp.dot(wt_ref[0, 0, :mlive, :], yop,
                     preferred_element_type=jnp.int32)

    # pattern reduce as two MXU matmuls (see :func:`_pattern_matmul_reduce`)
    wcol = wcol_ref[:, :mlive] if use_wcol else None
    cntp, smp = _pattern_matmul_reduce(scores, mlive, U, et, wcol)

    # text window planes: wq[r, u] packs codes[t - SLOT_WB + 8q .. +7]
    # (4 bits per code) for position t = 8u + r of this tile.  The
    # extended code block adds SLOT_WB/8 lanes of the PREVIOUS tile on
    # the left, so offset c reads sublane (r + c) mod 8 at lane
    # u + PL + (r + c) // 8 — one sublane roll + two static lane slices
    # per offset (the shear trick).  The block and its per-phase rolls
    # build LAZILY: the packed-window path never touches the raw codes
    # again, so it must not pay the 7 sublane rolls.
    PL = SLOT_WB // 8
    wbits_w = gate_cfg[8] if gate_cfg is not None else 4
    WR = slot_cpp(wbits_w) * NW - SLOT_WB  # codes kept right of the hit
    HR = (7 + WR - 1) // 8 + 1  # right halo lanes
    si8 = jax.lax.broadcasted_iota(jnp.int32, (8, U), 0)
    # one sublane roll per phase offset, shared by every code_at call
    # (offsets c and c + 8 read the same rolled block at adjacent lanes)
    rolled8: dict = {}

    def code_at(c):
        # codes[t + c] plane over this tile's [8, U] positions: out[r, u]
        # = eblk[(r + c) % 8, PL + u + (r + c) // 8] — np.roll semantics
        # (rolled[i] = x[i - s]) give source r + cm at shift 8 - cm
        if -1 not in rolled8:
            rolled8[-1] = jnp.concatenate(
                [prev_ref[0][:, LANE - PL :].astype(jnp.int32),
                 codes_ref[0].astype(jnp.int32),
                 next_ref[0][:, :HR].astype(jnp.int32)], axis=1
            )  # [8, PL + U + HR]
        cm = c % 8
        g = (c - cm) // 8
        if cm not in rolled8:
            rolled8[cm] = (pltpu.roll(rolled8[-1], shift=8 - cm, axis=0)
                           if cm else rolled8[-1])
        rolled = rolled8[cm]
        lo = rolled[:, PL + g : PL + g + U]
        hi = rolled[:, PL + g + 1 : PL + g + 1 + U]
        return jnp.where(si8 < 8 - cm, lo, hi) if cm else lo

    hit = cntp > 0
    li = jax.lax.broadcasted_iota(jnp.int32, (8, U), 1)

    def _ablate_out(dep):
        # PERF-DEBUG early-out (see pallas_scan_gated_slots ``ablate``):
        # writes zero-shaped outputs with a non-eliminable dependency on
        # the work done so far (a `* 0` dependency would be algebraically
        # removed by Mosaic; the compare survives)
        big = jnp.int32(1 << 30)
        out_ref[0] = jnp.where(dep[:, :cap] < big, 0, 1)
        ocnt_ref[0] = jnp.where(dep[:, :LANE] < big, 0, 1)

    if gate_cfg is not None and ablate == "scan":
        _ablate_out(cntp + smp)
        return

    # meta layout: (localpos << 15) | (sid_sum << 5) | cnt — localpos
    # (< T <= 65536) bits 15..30, the 10-bit id sum (<= 8 * 127 for any
    # chain short enough to resolve; longer ones saturate the count and
    # rescan anyway) bits 5..14, count bits 0..4 saturating at 31 (the
    # EOS-window escape marker).  Bit 31 is the gate's escape flag.
    localpos = (li << 3) | si8
    cnt_w = cntp
    sum10 = jnp.minimum(smp, 1023) << 5
    if use_wpack:
        # packed-window form (wpack_transpose): one shear read per
        # 12-code plane, EOS-escape as one bit test
        PLW = SLOT_WB // 8
        HRW = 3
        ewblk = jnp.concatenate(
            [wprev_ref[0][:, LANE - PLW :], wcur_ref[0],
             wnext_ref[0][:, :HRW]], axis=1)
        wrolled = {}

        def wplane_at(c):
            cm = c % 8
            g = (c - cm) // 8
            if cm not in wrolled:
                wrolled[cm] = (pltpu.roll(ewblk, shift=8 - cm, axis=0)
                               if cm else ewblk)
            rolled = wrolled[cm]
            lo = rolled[:, PLW + g : PLW + g + U]
            hi = rolled[:, PLW + g + 1 : PLW + g + 1 + U]
            return jnp.where(si8 < 8 - cm, lo, hi) if cm else lo

        if eos_esc >= 0:
            emf = (wplane_at(0) >> WPACK_EOSBIT) & 1
            cnt_w = jnp.where(emf > 0, 31, cnt_w)
        meta = (localpos << 15) | sum10 | jnp.minimum(cnt_w, 31)
        planes = [meta] + [wplane_at(-SLOT_WB + WPACK_CPP * q)
                           for q in range(NW)]
    else:
        if eos_esc >= 0:
            # FOLDED weights (one fewer one-hot plane): margins are
            # exact except at windows containing a no-plane code (= EOS
            # here, the fold_ok precondition) — saturate those
            # positions' counts so they take the escape path and the
            # host rescans them exactly
            em = code_at(0) == eos_esc
            for c in range(1, Lmax):
                em = em | (code_at(c) == eos_esc)
            cnt_w = jnp.where(em, 31, cnt_w)
        meta = (localpos << 15) | sum10 | jnp.minimum(cnt_w, 31)
        # text window payload planes, `wbits` bits per code (2-bit form
        # for DNA aliases any code > 3 to code & 3 — a pure gate
        # RELAXATION: extension patterns never accept EOS, so reading
        # 'A' where the text has EOS only ever ADDS gate survivors, and
        # the host extension is exact)
        cpp = slot_cpp(wbits_w)
        cmask = (1 << wbits_w) - 1
        planes = [meta]
        for q in range(NW):
            # pack via chained small shifts (single large shift amounts
            # have miscompiled on this target)
            w = code_at(-SLOT_WB + cpp * q + cpp - 1) & cmask
            for b in range(cpp - 2, -1, -1):
                w = (w << wbits_w) | (code_at(-SLOT_WB + cpp * q + b)
                                      & cmask)
            planes.append(w)
    if gate_cfg is None:
        hit32 = hit.astype(jnp.int32)
        p = hit32
        s = 1
        while s < U:
            p = p + jnp.where(li >= s, pltpu.roll(p, shift=s, axis=1), 0)
            s *= 2
        rowcnt = p[:, U - 1 : U]
        out = _row_compact(planes, hit, rowcnt, U, cap)
        for q in range(1 + NW):
            slots_ref[0, q] = out[q][:, :cap]
        cnt_ref[0] = jnp.broadcast_to(rowcnt, (8, LANE))
        return
    if ablate == "nocompact":
        dep = planes[0]
        for q in range(1, 1 + NW):
            dep = dep + planes[q]
        _ablate_out(dep)
        return
    # fused extension gate on the compacted slots (windows stay in VMEM)
    LgT, kk, band, indels, lens, T, n, Lmax, wbits, segl, capg = gate_cfg
    Ueff = U
    while Ueff > U // fold:
        # 2:1 HALF-FOLD levels before the compaction network: lane u of
        # the folded planes carries the hit of lane u OR lane u + H (the
        # two halves of the current width), so the prefix + shift
        # network — the gated kernel's dominant VPU cost — runs on
        # 1/fold-width planes.  Hits landing on several lanes of a fold
        # group (probability ~density^2 per level at the k=1 seed
        # density) emit an ESCAPE slot (cnt marker 30) and the host
        # rescans ALL `fold` window starts of the group exactly
        # (conv_scan._slots_decode), so the fold is lossless.  The meta
        # plane carries the ORIGINAL localpos of a group member either
        # way (the decode rebases it to the group).
        H = Ueff // 2
        hitA, hitB = hit[:, :H], hit[:, H:]
        both = hitA & hitB
        escmeta = (localpos[:, :H] << 15) | 30
        m = jnp.where(hitA, planes[0][:, :H], planes[0][:, H:])
        folded = [jnp.where(both, escmeta, m)]
        for q in range(1, 1 + NW):
            folded.append(
                jnp.where(hitA, planes[q][:, :H], planes[q][:, H:]))
        planes, hit, Ueff = folded, hitA | hitB, H
    packed, segcnt = _seg_compact(planes, hit, Ueff, segl, capg)
    if ablate == "nogate":
        dep = packed[0]
        for q in range(1, 1 + NW):
            dep = dep + packed[q]
        _ablate_out(dep + segcnt[:, :cap])
        return
    meta_c = packed[0]
    wp = packed[1:]
    emeta, keep = _gate_body(
        meta_c, lambda q: wp[q], gt_ref[0], pl.program_id(0) * T,
        NW=NW, LgT=LgT, kk=kk, band=band, indels=indels, lens=lens,
        n=n, Lmax=Lmax, wbits=wbits,
        cpp=WPACK_CPP if use_wpack else None)
    if ablate == "aftergate":
        _ablate_out(emeta + keep.astype(jnp.int32))
        return
    kept32 = keep.astype(jnp.int32)
    li2 = jax.lax.broadcasted_iota(jnp.int32, (8, cap), 1)
    pfx = kept32
    s = 1
    while s < cap:
        pfx = pfx + jnp.where(li2 >= s, pltpu.roll(pfx, shift=s, axis=1), 0)
        s *= 2
    rowcnt2 = pfx[:, cap - 1 : cap]
    fin = _row_compact([emeta], keep, rowcnt2, cap, cap)
    out_ref[0] = fin[0]
    # lane 0: kept count; lanes 8..8+nsegs: RAW per-segment hit counts
    # (slot overflow detection at segment granularity; the inclusive
    # prefix's LAST lane per segment is that segment's true count)
    nsegs = Ueff // segl
    if ablate == "nosegcnt":
        segslices = [jnp.where(segcnt[:, g * segl : g * segl + 1] < (
            1 << 30), 0, 1) for g in range(nsegs)]
    else:
        segslices = [segcnt[:, (g + 1) * segl - 1 : (g + 1) * segl]
                     for g in range(nsegs)]
    segcounts = jnp.concatenate(
        [rowcnt2]
        + [jnp.zeros((8, 7), jnp.int32)]
        + segslices
        + [jnp.zeros((8, LANE - 8 - nsegs), jnp.int32)], axis=1)
    ocnt_ref[0] = segcounts


@functools.partial(
    jax.jit,
    static_argnames=("classes", "Lmax", "T", "NW", "cap", "interpret",
                     "n_pat"),
)
def pallas_scan_slots(codes, W, thr, t3=None, wcol=None, *, classes: tuple,
                      Lmax: int,
                      T: int = 65536, NW: int = 6, cap: int = SLOT_CAP,
                      interpret: bool = False, n_pat: int | None = None):
    """Whole-array scan with IN-KERNEL hit extraction (see
    :func:`_slots_kernel`).  Requires :func:`pos_exact_ok` weights
    (unfolded, fold=False), a single pattern tile (n_pat <= 128) and a
    single K chunk.  Returns ``(slots [ntiles, 1 + NW, 8, cap] int32,
    counts [ntiles, 8, LANE] int32)``."""
    del thr
    if Lmax > HALO:
        raise NotImplementedError(f"Lmax {Lmax} exceeds kernel halo {HALO}")
    U = T // 8
    if cap > U:
        raise ValueError(f"slot cap {cap} exceeds row lanes {U}")
    na = _na(Lmax)
    n = codes.shape[0]
    ntiles = max((n + T - 1) // T, 1)
    if W.shape[0] != 8 * LANE or W.shape[1] != LANE:
        raise NotImplementedError("slots kernel needs ptiles=kchunks=1")
    plive = min(max(n_pat or LANE, 1), LANE)
    if t3 is None:
        t3 = phase_transpose(codes, T)
    # left window halo: the previous tile's last LANE lanes (block specs
    # need 128-lane alignment; the kernel slices its last SLOT_WB//8).
    # The trailing all-pad tile of t3 doubles as tile -1's pad via the
    # roll.
    prev = jnp.roll(t3[:, :, U - LANE :], 1, axis=0)
    W4 = W.reshape(1, 8 * LANE, 1, LANE).swapaxes(1, 2)

    in_specs = [
        pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, U), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, U), lambda i: (i + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8 * LANE, LANE), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [prev, t3, t3, W4]
    if wcol is not None:
        in_specs.append(pl.BlockSpec((8, 8 * LANE), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wcol)

    slots, counts = pl.pallas_call(
        functools.partial(
            _slots_kernel, classes=classes, U=U, na=na, plive=plive,
            NW=NW, cap=cap, use_wcol=wcol is not None,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, 1 + NW, 8, cap), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, 8, LANE), jnp.int32),
        ),
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1 + NW, 8, cap), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((LANE, U), jnp.int8),
            pltpu.VMEM((8 * len(classes), U + _na(Lmax) - 1), jnp.int8),
        ],
        interpret=interpret,
    )(*args)
    return slots, counts


def _gate_body(meta, wplane, gtbl, tile_base, *, NW: int, LgT: int,
               kk: int, band: int, indels: bool, lens: tuple, n: int,
               Lmax: int, wbits: int = 4, cpp: int | None = None):
    """The slotted banded seed-extension gate on [8, C] planes.

    Per slot the anchored banded edit distance of (the first ``LgT``
    positions of) its seed's extension pattern is evaluated against the
    slot's packed text window — a PREFIX of the exact gate
    (:func:`..gate._gate_ok`), so still a SUPERSET filter.  Returns
    ``(emeta, keep)``: slots that pass the gate OR need the host's exact
    rescan (multi-seed positions, windows at the array tail), with bit
    31 marking the escapes.

    ``gtbl`` [32, LANE]: per-seed columns (seed id s = lane s): row
    2j / 2j+1 = low/high byte of the accept bitmask of extension
    position j (bit c = accepts code c); row 2*LgT = extension length
    (clamped to LgT), +1 = lmatch flag, +2 = seed length.  ``wplane(q)``
    = window plane q ([8, C] int32); ``tile_base`` = this tile's first
    text position (traced scalar)."""
    cap = meta.shape[1]
    valid = meta != 0
    sid = (meta >> 5) & 1023  # the id sum; == the seed id when cnt == 1
    cntv = meta & 31
    localpos = meta >> 15
    pstart = localpos + tile_base
    INF = jnp.int32(kk + 1)

    # per-slot gate metadata via one-hot MXU lookup (no lane gathers):
    # onehot_r [S=LANE, cap] @ gt rows -> per-slot bytes
    grows = []
    siota = jax.lax.broadcasted_iota(jnp.int32, (LANE, cap), 0)
    for r in range(8):
        # bf16 operands: table bytes <= 255 are exact in bf16, and int8
        # would wrap values >= 128
        oh = (sid[r : r + 1, :] == siota).astype(jnp.bfloat16)
        g = jnp.dot(gtbl.astype(jnp.bfloat16), oh,
                    preferred_element_type=jnp.float32
                    ).astype(jnp.int32)  # [32, cap]
        grows.append(g)

    def gplane(row):  # [8, cap] plane of gt row `row` per slot
        return jnp.concatenate(
            [grows[r][row : row + 1, :] for r in range(8)], axis=0)

    acc = [gplane(2 * j) | (gplane(2 * j + 1) << 8) for j in range(LgT)]
    glen = gplane(2 * LgT)
    ispos = gplane(2 * LgT + 1) > 0
    slen = gplane(2 * LgT + 2)

    # codes per window plane: slot_cpp(wbits) for kernel-packed planes,
    # WPACK_CPP for the precomputed packed-window form (which also keeps
    # an EOS flag at bit 24 — the unpack below never reaches it at 12
    # codes x 2 bits)
    if cpp is None:
        cpp = slot_cpp(wbits)
    cmask = (1 << wbits) - 1
    span = cpp * NW - SLOT_WB  # codes available right of pstart
    # the out-of-window sentinel: a code index whose accept bit is never
    # set (bit 15 with 4-bit windows; with 2-bit DNA windows no sentinel
    # exists, so out-of-window reads alias to code 3 — a gate RELAXATION
    # only, same argument as the EOS alias)
    sent = cmask if wbits < 4 else 15

    # unpack every window code once, CHAINED >> wbits steps (single
    # large shift amounts have miscompiled on this target)
    codes_flat = []
    for q in range(NW):
        v = wplane(q)
        for _b in range(cpp):
            codes_flat.append(v & cmask)
            v = v >> wbits

    def wcode(c):  # window code at offset c from pstart (static c)
        return codes_flat[c + SLOT_WB]

    def text_at(t):  # DP text char t (0-based along the walk direction)
        # lmatch walks forward from anchor = pstart + seed_len (variable
        # per slot: select over the distinct registered lengths); rmatch
        # walks backward from pstart - 1 (seed-length independent)
        back = (wcode(-1 - t) if 1 + t <= SLOT_WB
                else jnp.full_like(meta, sent))
        fwd = jnp.zeros_like(meta)
        for L in lens:
            if L + t < span:
                fwd = jnp.where(slen == L, wcode(L + t), fwd)
            else:
                fwd = jnp.where(slen == L, sent, fwd)
        return jnp.where(ispos, fwd, back)

    Wg = LgT + band
    ACC = []
    for t in range(Wg):
        w = text_at(t)
        if wbits <= 2:
            # static-shift select: variable-amount >> by a value that is
            # itself a shift+mask product miscompiles on this target
            ACC.append([
                ((w == 0) & ((a & 1) > 0))
                | ((w == 1) & (((a >> 1) & 1) > 0))
                | ((w == 2) & (((a >> 2) & 1) > 0))
                | ((w == 3) & (((a >> 3) & 1) > 0))
                for a in acc
            ])
        else:
            ACC.append([((a >> w) & 1) > 0 for a in acc])

    res = jnp.where(glen == 0, 0, INF)
    D = [jnp.full_like(meta, INF) for _ in range(2 * band + 1)]
    if indels:
        for d in range(2 * band + 1):
            v = min(max(d - band, 0) if d >= band else kk + 1, kk + 1)
            D[d] = jnp.full_like(meta, v)
    else:
        D[band] = jnp.zeros_like(meta)
    for p in range(1, LgT + 1):
        cols = []
        prev_col = None
        for d in range(2 * band + 1):
            tpos = p + d - band
            if tpos == 0 and indels and d + 1 <= 2 * band:
                v = jnp.minimum(D[d + 1] + 1, INF)
            elif tpos < 1 or tpos > Wg:
                v = jnp.full_like(meta, INF)
            else:
                sub = jnp.where(ACC[tpos - 1][p - 1], 0, 1)
                v = D[d] + sub
                if indels:
                    if d + 1 <= 2 * band:
                        v = jnp.minimum(v, D[d + 1] + 1)
                    if prev_col is not None:
                        v = jnp.minimum(v, prev_col + 1)
                v = jnp.minimum(v, INF)
            cols.append(v)
            prev_col = v
        D = cols
        rowmin = D[0]
        for d in range(1, 2 * band + 1):
            rowmin = jnp.minimum(rowmin, D[d])
        res = jnp.where(glen == p, rowmin, res)
    ok = res <= kk

    escape = valid & ((cntv > 1) | (pstart > n - Lmax))
    keep = valid & (pstart < n) & (ok | escape)
    emeta = jnp.where(escape, meta | jnp.int32(-2147483648), meta)
    return emeta, keep


def _gate_slots_kernel(slots_ref, cnt_ref, gt_ref, out_ref, ocnt_ref, *,
                       NW: int, cap: int, LgT: int, kk: int, band: int,
                       indels: bool, lens: tuple, T: int, n: int,
                       Lmax: int):
    """:func:`_gate_body` over one tile's compacted hit slots; survivors
    and escapes re-compact per row into ``out_ref`` [1, 8, cap] plus
    ``ocnt_ref`` [1, 8, LANE] row counts."""
    i = pl.program_id(0)
    emeta, keep = _gate_body(
        slots_ref[0, 0], lambda q: slots_ref[0, 1 + q], gt_ref[0], i * T,
        NW=NW, LgT=LgT, kk=kk, band=band, indels=indels, lens=lens, n=n,
        Lmax=Lmax)
    kept32 = keep.astype(jnp.int32)
    li = jax.lax.broadcasted_iota(jnp.int32, (8, cap), 1)
    pfx = kept32
    s = 1
    while s < cap:
        pfx = pfx + jnp.where(li >= s, pltpu.roll(pfx, shift=s, axis=1), 0)
        s *= 2
    rowcnt = pfx[:, cap - 1 : cap]
    out = _row_compact([emeta], keep, rowcnt, cap, cap)
    out_ref[0] = out[0]
    ocnt_ref[0] = jnp.broadcast_to(rowcnt, (8, LANE))


@functools.partial(
    jax.jit,
    static_argnames=("NW", "cap", "LgT", "kk", "band", "indels", "lens",
                     "T", "n", "Lmax", "interpret"),
)
def pallas_gate_slots(slots, counts, gtbl, *, NW: int, cap: int, LgT: int,
                      kk: int, band: int, indels: bool, lens: tuple,
                      T: int, n: int, Lmax: int, interpret: bool = False):
    """Run :func:`_gate_slots_kernel` over every tile's slots.  Returns
    (kept [ntiles, 8, cap] int32, kept_counts [ntiles, 8, LANE])."""
    ntiles = slots.shape[0]
    return pl.pallas_call(
        functools.partial(
            _gate_slots_kernel, NW=NW, cap=cap, LgT=LgT, kk=kk, band=band,
            indels=indels, lens=lens, T=T, n=n, Lmax=Lmax,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, 8, cap), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, 8, LANE), jnp.int32),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1 + NW, 8, cap), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(slots, counts, gtbl)


@functools.partial(
    jax.jit,
    static_argnames=("classes", "Lmax", "T", "NW", "cap", "LgT", "kk",
                     "band", "indels", "lens", "out_cap", "oflow_cap",
                     "interpret", "n_pat", "eos_esc", "wbits", "work_cap",
                     "chain_Lg", "segl", "ablate", "fold",
                     "chain_ecap"),
)
def pallas_scan_gated_slots(codes, W, thr, gtbl, t3=None, wpk=None,
                            chain=None, wcol=None, feed=None, *,
                            classes: tuple, Lmax: int, T: int = 65536,
                            NW: int = 6, cap: int = SLOT_CAP, LgT: int = 8,
                            kk: int = 1, band: int = 1, indels: bool = True,
                            lens: tuple = (), out_cap: int = 4096,
                            oflow_cap: int = 64, interpret: bool = False,
                            n_pat: int | None = None, eos_esc: int = -1,
                            wbits: int = 4, work_cap: int | None = None,
                            chain_Lg: int = 0, segl: int | None = None,
                            ablate: str = "", fold: int = 1,
                            chain_ecap: int = 2048):
    """The whole k>0 pigeonhole front-end in Pallas: scan + in-kernel hit
    extraction (:func:`pallas_scan_slots`) -> slotted extension gate
    (:func:`pallas_gate_slots`) -> tiny XLA dense-pack.  The only XLA
    work is a [ntiles*8]-row cumsum and ``work_cap``-sized gathers — no
    O(positions) op ever runs outside the kernels.

    ``chain`` (optional) = (mtab, slen, gaccept, gglen, ggdir): the
    device chain-member gate.  Multi-seed escapes are mostly RANDOM
    half-matches of prefix-nested seed pairs whose extensions all fail;
    without this, every one of them is fetched and host-extended (the
    dominant k=1 serving tail).  mtab [KS, CKR, CM] maps the observable
    (id_sum, cnt) key to its chain member sids (-1 = none /
    unresolvable); each member's banded extension DP runs via the XLA
    gate (:func:`..gate._gate_ok`, tables gaccept/gglen/ggdir, Lg =
    ``chain_Lg``) over the work_cap-sized candidate row — escapes where
    EVERY member fails are dropped ON DEVICE (they could not survive the
    exact host extension either), identical final output.

    Returns ONE packed int32 row:
        [total, oflow_count,
         pos x out_cap, meta x out_cap, oflow_row x oflow_cap, work_total]
    where total = gate survivors + kept escapes (> out_cap -> caller
    retries with a bigger cap; work_total likewise vs work_cap), pos =
    window start position, meta bit 31 = escape (multi-seed or tail
    position: host chain-expands or rescans those starts exactly), else
    (sid << 5) | cnt in the low bits; oflow_row lists (tile*8 + r) * nsegs
    + g segments whose TRUE hit count exceeded the slot cap — the caller
    escapes those segments' every position (correctness never depends on
    caps)."""
    from ..compact import compact_mask
    from ..gate import _gate_ok

    codes = codes.astype(jnp.uint8)
    n = int(codes.shape[0])
    U = T // 8
    if cap > U:
        raise ValueError(f"slot cap {cap} exceeds row lanes {U}")
    na = _na(Lmax)
    ntiles = max((n + T - 1) // T, 1)
    if W.shape[0] != 8 * LANE or W.shape[1] != LANE:
        raise NotImplementedError("slots kernel needs ptiles=kchunks=1")
    plive = min(max(n_pat or LANE, 1), LANE)
    # segment length of the in-kernel compaction network: the shift
    # network's stage count is log2(segl), so SHORTER segments cut the
    # dominant VPU cost (stages x planes over the full tile) — at the
    # price of per-segment slot caps (capg = cap // nsegs) that overflow
    # (-> escape) on locally dense hit clusters.  With ``fold`` > 1 the
    # network runs on the 1/fold-width folded planes (see _slots_kernel).
    if fold not in (1, 2, 4, 8) or U % fold:
        raise ValueError(f"bad fold {fold}")
    Ueff = U // fold
    segl = min(segl or 1024, Ueff)
    nsegs = Ueff // segl
    if cap % nsegs:
        raise ValueError("cap must divide into the segment count")
    capg = cap // nsegs
    if t3 is None:
        t3 = phase_transpose(codes, T)
    prev = jnp.roll(t3[:, :, U - LANE :], 1, axis=0)
    W4 = W.reshape(1, 8 * LANE, 1, LANE).swapaxes(1, 2)
    use_wpack = wpk is not None
    in_specs = [
        pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, U), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, U), lambda i: (i + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8 * LANE, LANE), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [prev, t3, t3, W4]
    if feed is not None:
        # precomputed im2col operand (imcol_transpose), one tile/step
        in_specs.append(pl.BlockSpec((1, LANE, U), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(feed)
    if wcol is not None:
        # per-score-row chain weights, read by the kernel right after wt
        in_specs.append(pl.BlockSpec((8, 8 * LANE), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wcol)
    in_specs.append(pl.BlockSpec((1, 32, LANE), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(gtbl)
    if use_wpack:
        wprev = jnp.roll(wpk[:, :, U - LANE :], 1, axis=0)
        in_specs += [
            pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, U), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, U), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [wprev, wpk, wpk]
    kept, counts = pl.pallas_call(
        functools.partial(
            _slots_kernel, classes=classes, U=U, na=na, plive=plive,
            NW=NW, cap=cap,
            gate_cfg=(LgT, kk, band, indels, lens, T, n, Lmax, wbits,
                      segl, capg),
            eos_esc=eos_esc, Lmax=Lmax, use_wpack=use_wpack,
            use_wcol=wcol is not None, ablate=ablate, fold=fold,
            use_feed=feed is not None,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, 8, cap), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, 8, LANE), jnp.int32),
        ),
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 8, cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((LANE, U) if feed is None else (8, LANE),
                       jnp.int8),
            pltpu.VMEM((8 * len(classes), U + na - 1) if feed is None
                       else (8, LANE), jnp.int8),
        ],
        interpret=interpret,
    )(*args)
    nrows = ntiles * 8
    # raw per-segment hit counts: overflow escapes at row-SEGMENT
    # granularity (oflow ids = (tile*8 + r) * nsegs + g)
    segraw = counts[:, :, 8 : 8 + nsegs].reshape(nrows * nsegs)
    oflow_count, oflow_idx = compact_mask(segraw > capg, oflow_cap)
    oflow_row = jnp.where(oflow_idx < nrows * nsegs, oflow_idx, -1)

    wcap = work_cap or out_cap
    rowcnt2 = jnp.minimum(counts[:, :, 0].reshape(nrows), cap)
    cum = jnp.cumsum(rowcnt2)
    wtotal = cum[nrows - 1]
    j = jax.lax.broadcasted_iota(jnp.int32, (wcap,), 0)
    row = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    rows = jnp.minimum(row, nrows - 1)
    s = j - (cum[rows] - rowcnt2[rows])
    val = kept.reshape(nrows, cap)[rows, jnp.minimum(s, cap - 1)]
    valid = j < wtotal
    localpos = (val & 0x7FFFFFFF) >> 15
    pstart = (rows >> 3) * T + localpos

    keep2 = valid
    if chain is not None:
        mtab, slen, gaccept, gglen, ggdir = chain
        KS, CKR, CM = mtab.shape
        esc = val < 0
        cnts = val & 31
        sums = (val >> 5) & 1023
        is_chain = (valid & esc & (cnts >= 2) & (cnts <= 1 + CKR)
                    & (pstart <= n - Lmax) & (sums < KS))
        # COMPACT the chain-escape rows before the member gates: each
        # member gate gathers a text window per row, and running CM
        # gates over all ``wcap`` rows cost ~0.4 ms/scan (ablated), ~8x
        # the compacted form.  ecap covers the observed escape rates
        # (nested primer sets put MOST multi-seed candidates on the
        # chain path — ~1.3k/scan on the bench set); rows past it
        # simply stay kept and the host chain-expands them exactly,
        # output identical.
        ecap = min(chain_ecap, wcap)
        _ecount, eidx = compact_mask(is_chain, ecap)
        ev = eidx < wcap
        ei = jnp.minimum(eidx, wcap - 1)
        key_s = jnp.where(ev, sums[ei], 0)
        key_c = jnp.clip(cnts[ei] - 2, 0, CKR - 1)
        resolved = mtab[key_s, key_c, 0] >= 0
        any_ok = jnp.zeros((ecap,), jnp.bool_)
        for m in range(CM):
            sid_m = mtab[key_s, key_c, m]
            sid_c = jnp.clip(sid_m, 0, slen.shape[0] - 1)
            anch = (pstart[ei] + slen[sid_c]).astype(jnp.int32)
            okm = _gate_ok.__wrapped__(
                codes, anch, sid_c, gaccept, gglen, ggdir,
                Lg=chain_Lg, k=kk, band=band, indels=indels, n=n)
            any_ok = any_ok | ((sid_m >= 0) & okm)
        drop_c = ev & resolved & ~any_ok
        # scatter the verdicts back to the work row (add: clamped pad
        # indices carry False and never flip a real row)
        dropmask = jnp.zeros((wcap,), jnp.int32).at[ei].add(
            drop_c.astype(jnp.int32)) > 0
        keep2 = valid & ~dropmask

    total, sel = compact_mask(keep2, out_cap)
    fvalid = sel < wcap
    fidx = jnp.minimum(sel, wcap - 1)
    return jnp.concatenate([
        total[None], oflow_count[None],
        jnp.where(fvalid, pstart[fidx], -1).astype(jnp.int32),
        jnp.where(fvalid, val[fidx], 0).astype(jnp.int32),
        oflow_row.astype(jnp.int32),
        wtotal[None],
    ])


def slots_gate_table(gate, lengths, LgT: int, w=None) -> np.ndarray:
    """[32, 128] int32 per-seed gate metadata for
    :func:`_gate_slots_kernel` (column = the seed's chain-weight code
    ``w[s]``, or the seed id when ``w`` is None): accept-bitmask bytes
    per truncated extension position, then extension length (clamped),
    lmatch flag, seed length."""
    bits = gate.bits_np  # [S, Lg]
    S, Lg = bits.shape
    if S > LANE:
        raise ValueError(f"{S} seeds exceed the slots gate table width")
    col = (np.arange(S, dtype=np.int64) if w is None
           else np.asarray(w[:S], np.int64))
    tbl = np.zeros((32, LANE), np.int32)
    for j in range(min(LgT, Lg)):
        tbl[2 * j, col] = bits[:, j] & 0xFF
        tbl[2 * j + 1, col] = (bits[:, j] >> 8) & 0xFF
    tbl[2 * LgT, col] = np.minimum(gate.glen_np, LgT)
    tbl[2 * LgT + 1, col] = (gate.dir_np > 0).astype(np.int32)
    tbl[2 * LgT + 2, col] = np.asarray(lengths[:S], np.int32)
    return tbl


def slots_fold_ok(tables, k: int, poison_eos: bool) -> bool:
    """True when the slots pipeline may use the FOLDED weights (one
    fewer one-hot plane) with EOS-window escapes keeping it exact: the
    only no-plane code after folding must be the EOS code itself, and
    the escape dilation stays cheap."""
    if tables.Lmax > 16:
        return False
    _W, _t, cu = kernel_weights(tables, k, poison_eos, fold=False)
    _W, _t, cf = kernel_weights(tables, k, poison_eos, fold=True)
    missing = set(range(tables.alpha)) - set(cf) - (set(cu) - set(cf))
    return missing <= {tables.eos_code}


def slots_gated_ok(tables, gate, k: int) -> bool:
    """Static eligibility of the all-Pallas slots pipeline for a seed
    scanner + gate pair (falls back to the pos-words pipeline
    otherwise)."""
    if not pos_exact_ok(tables, k):
        return False
    if tables.P > LANE or tables.alpha > 15:
        return False
    if len(set(int(x) for x in tables.lengths)) > 8:
        return False
    if gate.alpha > 15 or gate.bits_np.shape[0] > LANE:
        return False
    band = gate.band
    LgT = max(1, min(8, int(np.max(gate.glen_np, initial=1))))
    maxlen = int(tables.lengths.max(initial=1))
    need = SLOT_WB + maxlen + LgT + band
    return -(-need // 8) <= 8  # window planes fit


def pos_exact_ok(tables, k: int) -> bool:
    """True when the in-kernel "pos" extraction is EXACT for this scan
    config: margins must equal (score - threshold) of the true accept
    test.  Requires k == 0 (the gated pipeline's seed scans are always
    exact), every threshold = pattern length within the int8 bias clip,
    and Lmax within the kernel halo.  Weights from
    :func:`..tables.conv_weights` are 0/1(+poison) by construction, so
    margin >= 0 <=> every window position accepted <=> true hit; EOS
    (poison or plain-zero) sinks straddling windows below threshold
    either way."""
    return bool(
        k == 0
        and tables.Lmax <= HALO
        and int(tables.lengths.max(initial=1)) <= 127
        and int(tables.lengths.min(initial=1)) >= 1
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "classes", "alpha", "Lmax", "eos_code", "T", "MB", "cap_mb",
        "hit_cap", "interpret"
    ),
)
def pallas_scan_hits(codes, W, thr, wconv, thresholds, lengths, t3=None,
                     feed=None, ohp=None, *,
                     classes: tuple, alpha: int,
                     Lmax: int, eos_code: int = -1, T: int = 4096, MB: int = 32,
                     cap_mb: int = 1024, hit_cap: int = 4096,
                     interpret: bool = False):
    """The full scan pipeline in ONE device call: Mosaic microblock filter ->
    nonzero compaction -> candidate window gather -> exact rescore -> hit
    index extraction.  A single host round-trip per scan (the scan loop seam
    of the reference, primer_match.cc:1114-1268, costs one cursor save per
    batch; here it costs one transfer per *database*).

    codes: [n] int32; wconv: [Lmax, alpha, P] bf16 (conv_weights layout);
    thresholds, lengths: [P] f32 / int32.
    Returns ONE packed int32 array: (mb_count, hit_count, mb_idx...,
    hits...) — a hit flat-indexes [cap_mb, MB, P] row-major; overflow
    when mb_count > cap_mb or hit_count > hit_cap (caller retries with
    bigger caps).  When the flat index space fits 24 bits the mismatch
    count rides in the hit word's high byte (``mism << 24 | idx``, row
    length 2 + cap_mb + hit_cap); otherwise mismatches follow as a
    separate section (row length 2 + cap_mb + 2*hit_cap).  Packed because
    on the tunneled device transport fetch cost is RTT + payload/~20MB/s
    — one small array, one fetch."""
    from ..compact import compact_mask

    codes = codes.astype(jnp.uint8)  # alphabet codes < 256, end-to-end
    n = codes.shape[0]
    P = wconv.shape[2]
    mh = _microhits_impl(codes, W, thr, classes=classes, Lmax=Lmax, T=T,
                         MB=MB, interpret=interpret, n_pat=P,
                         occupancy=True, t3=t3, feed=feed, ohp=ohp)
    nmb = mh.shape[0]
    mb_count, mb_idx = compact_mask(mh, cap_mb)

    win_len = MB + Lmax - 1
    # pad with EOS (callers pass a real code >= 0) so windows crossing the
    # array end behave exactly like the XLA block path (poison weights
    # reject them in k>0 mode)
    eos_fill = jnp.full(nmb * MB + win_len - n, max(eos_code, 0), jnp.uint8)
    padded = jnp.concatenate([codes, eos_fill])

    # advanced-indexing gather (a vmap'd dynamic_slice compiles
    # pathologically on this backend)
    starts = jnp.minimum(mb_idx, nmb - 1).astype(jnp.int32) * MB
    wins = padded[
        starts[:, None]
        + jax.lax.broadcasted_iota(jnp.int32, (1, win_len), 1)
    ]  # [cap_mb, win_len]
    # one im2col matmul instead of an Lmax-pass accumulation: the
    # [cap_mb, MB, P] score tensor is written ONCE (the fori_loop version
    # rewrote it Lmax times — gigabytes of HBM traffic when seeds are
    # short and candidate microblocks dense).  Scores are integer-valued
    # and < 256, exact in bf16.
    sub_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (MB, Lmax), 0)
        + jax.lax.broadcasted_iota(jnp.int32, (MB, Lmax), 1)
    )
    sub = wins[:, sub_idx]  # [cap_mb, MB, Lmax]
    im2col = jax.nn.one_hot(sub, alpha, dtype=jnp.bfloat16).reshape(
        cap_mb * MB, Lmax * alpha)
    w2 = wconv.reshape(Lmax * alpha, P)
    scores = jnp.dot(im2col, w2,
                     preferred_element_type=jnp.bfloat16)  # [cap*MB, P]
    valid = jnp.repeat(mb_idx < nmb, MB)[:, None]
    hit = (scores >= thresholds[None, :].astype(jnp.bfloat16)) & valid
    hit_count, hit_idx = compact_mask(hit.reshape(-1), hit_cap)
    # mismatch counts gathered per hit only (never materialized densely)
    sflat = jnp.concatenate(
        [scores.reshape(-1), jnp.zeros((1,), jnp.bfloat16)]
    )
    mism = jnp.clip(
        lengths[hit_idx % P].astype(jnp.int32)
        - sflat[hit_idx].astype(jnp.int32), 0, 127)
    if cap_mb * MB * P < (1 << 24):
        hits = (mism << 24) | hit_idx.astype(jnp.int32)
        return jnp.concatenate(
            [mb_count[None], hit_count[None], mb_idx, hits])
    return jnp.concatenate([
        mb_count[None], hit_count[None], mb_idx,
        hit_idx.astype(jnp.int32), mism,
    ])


@functools.partial(
    jax.jit,
    static_argnames=(
        "classes", "alpha", "Lmax", "eos_code", "T", "MB", "cap_mb",
        "hit_cap", "multi_cap", "surv_cap", "Lg", "kk", "band", "indels",
        "interpret", "exact_pos",
    ),
)
def pallas_scan_gated(codes, W, thr, wconv, thresholds, lengths,
                      gaccept, gglen, ggdir, t3=None, *,
                      classes: tuple, alpha: int, Lmax: int,
                      eos_code: int = -1, T: int = 4096, MB: int = 32,
                      cap_mb: int = 1024, hit_cap: int = 4096,
                      multi_cap: int = 256, surv_cap: int = 512,
                      Lg: int = 16, kk: int = 1, band: int = 1,
                      indels: bool = True, interpret: bool = False,
                      exact_pos: bool = False):
    """The k>0 pigeonhole pipeline in ONE device call: Mosaic microblock
    seed filter -> compaction -> exact seed rescore -> per-position top
    seed -> SEED-EXTENSION GATE (:func:`..gate._gate_ok`, a vectorized
    banded DP superset of the true extension) -> survivor compaction.
    The host fetches only the (rare) gate survivors and re-extends them
    with the exact native DP — the find/verify alternation of
    exact_halves.cc:120-197 with the seed scan AND the almost-always-
    failing extensions kept on device.

    Dense-seed scaling: with short pigeonhole seeds the candidate count
    is ~1000x the exact path's, so the hit extraction NEVER materializes
    a ``[positions, P]`` mask compaction (a ``top_k`` over that costs
    more than the whole scan).  Instead the rescore reduces per POSITION
    — hit count and the top hitting seed id — and compacts the (~0.2%
    dense) position mask; positions where SEVERAL seeds hit (rare:
    prefix-nested or duplicate seeds) are emitted to a tiny escape list
    for the host to rescan exactly.

    Returns ONE packed int32 row:
        [mb_count, hit_count, multi_count, surv_count,
         surv_anchor x surv_cap, surv_sid x surv_cap,
         multi_start x multi_cap]
    (anchor = seed-hit end position; sid = 0-based seed index; the
    escape list holds window START positions).  Overflow when any count
    exceeds its cap — caller retries with bigger caps; correctness never
    depends on capacity."""
    from ..compact import compact_mask
    from ..gate import _gate_ok

    codes = codes.astype(jnp.uint8)
    n = codes.shape[0]
    P = wconv.shape[2]
    if exact_pos:
        # IN-KERNEL extraction (pos_exact_ok configs): the kernel itself
        # emits exact packed per-position words ((top_pid << 8) | cnt) —
        # no window gather, no one-hot rescore, no [positions, P] mask.
        # W must be the UNFOLDED kernel weights.
        pos = _kernel_out(codes, W, thr, classes=classes, Lmax=Lmax, T=T,
                          MB=MB, interpret=interpret, n_pat=P, emit="pos",
                          t3=t3)
        ntiles, ptiles, _, U = pos.shape
        G = MB // 8
        if ptiles == 1:
            word = pos[:, 0]  # [ntiles, 8, U]
        else:
            # global pattern id = local + LANE * tile, so the global id
            # SUM combines as sum_j (sum_j + LANE * j * cnt_j)
            live = pos >= 0
            cnt_t = jnp.where(live, pos & 255, 0)
            cnts = jnp.sum(cnt_t, axis=1)
            offs = (jnp.arange(ptiles, dtype=jnp.int32) * LANE
                    )[None, :, None, None]
            sums = jnp.sum(
                jnp.where(live, (pos >> 8) + offs * cnt_t, 0), axis=1)
            word = jnp.where(
                cnts > 0, (sums << 8) | jnp.minimum(cnts, 255),
                jnp.int32(-256))
        # microblock occupancy straight from the words (word >= 0 <=> hit)
        occ = word.max(axis=1)  # [ntiles, U]
        occ = occ.reshape(ntiles, U // G, G).max(axis=2).reshape(-1)
        nmb = ntiles * (U // G)
        mb0 = jax.lax.broadcasted_iota(jnp.int32, (nmb,), 0) * MB
        mb_count, mb_idx = compact_mask((occ >= 0) & (mb0 < n), cap_mb)
        # gather candidate microblocks' words; microblock m = tile
        # m // (U//G), lane group m % (U//G); position of word [c, r, d]
        # is T*i + 8*(g*G + d) + r
        mbs = jnp.minimum(mb_idx, nmb - 1)
        i = mbs // (U // G)
        g = mbs % (U // G)
        w3 = word.reshape(ntiles * 8, U)
        r_io = jax.lax.broadcasted_iota(jnp.int32, (cap_mb, 8, G), 1)
        d_io = jax.lax.broadcasted_iota(jnp.int32, (cap_mb, 8, G), 2)
        cols = (g * G)[:, None, None] + d_io
        wmb = w3[i[:, None, None] * 8 + r_io, cols]
        pstart = ((i * T)[:, None, None] + 8 * cols + r_io).reshape(-1)
        pvalid = (jnp.repeat(mb_idx < nmb, MB)) & (pstart < n)
        wflat = wmb.reshape(-1)
        cnt = jnp.where(pvalid & (wflat >= 0), wflat & 255, 0)
        top_pid = jnp.where(cnt > 0, wflat >> 8, -1)
        # windows overrunning the array end: the phase-transposed form is
        # ZERO-padded (code 0, not EOS), so the kernel's words there may
        # overcount — escape every such hit position to the exact host
        # rescan (<= Lmax - 1 positions; survivors there are dropped by
        # the caller in favor of the rescan, conv_scan.scan_gated)
        multi_m = (cnt > 1) | ((cnt > 0) & (pstart > n - Lmax))
    else:
        mh = _microhits_impl(codes, W, thr, classes=classes, Lmax=Lmax,
                             T=T, MB=MB, interpret=interpret, n_pat=P,
                             occupancy=True, t3=t3)
        nmb = mh.shape[0]
        mb_count, mb_idx = compact_mask(mh, cap_mb)

        win_len = MB + Lmax - 1
        eos_fill = jnp.full(nmb * MB + win_len - n, max(eos_code, 0),
                            jnp.uint8)
        padded = jnp.concatenate([codes, eos_fill])
        starts = jnp.minimum(mb_idx, nmb - 1).astype(jnp.int32) * MB
        wins = padded[
            starts[:, None]
            + jax.lax.broadcasted_iota(jnp.int32, (1, win_len), 1)
        ]
        sub_idx = (
            jax.lax.broadcasted_iota(jnp.int32, (MB, Lmax), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (MB, Lmax), 1)
        )
        sub = wins[:, sub_idx]
        im2col = jax.nn.one_hot(sub, alpha, dtype=jnp.bfloat16).reshape(
            cap_mb * MB, Lmax * alpha)
        w2 = wconv.reshape(Lmax * alpha, P)
        scores = jnp.dot(im2col, w2, preferred_element_type=jnp.bfloat16)
        hitm = scores >= thresholds[None, :].astype(jnp.bfloat16)
        # per-position reduction: hit count + top (max-id) hitting seed
        cnt = jnp.sum(hitm, axis=1, dtype=jnp.int32)  # [cap_mb*MB]
        piota = jax.lax.broadcasted_iota(jnp.int32, hitm.shape, 1)
        top_pid = jnp.max(jnp.where(hitm, piota, -1), axis=1)
        pstart = (starts[:, None]
                  + jax.lax.broadcasted_iota(jnp.int32, (1, MB), 1)
                  ).reshape(-1)
        pvalid = (jnp.repeat(mb_idx < nmb, MB)) & (pstart < n)
        cnt = jnp.where(pvalid, cnt, 0)
        multi_m = cnt > 1

    hit_count, sel = compact_mask(cnt > 0, hit_cap)
    svalid = sel < cap_mb * MB
    sidx = jnp.minimum(sel, cap_mb * MB - 1)
    cstart = pstart[sidx]
    # multi-hit entries carry an id SUM >= P in the word's high bits;
    # they are dropped in favor of the host rescan downstream, but the
    # gather/gate here must stay in range
    cpid = jnp.minimum(top_pid[sidx], P - 1)
    anchors = cstart + lengths[cpid].astype(jnp.int32)

    # escape list: positions with >1 hitting seed (host rescans those
    # windows exactly and resolves ALL their seeds itself)
    multi_count, msel = compact_mask(multi_m, multi_cap)
    mvalid = msel < cap_mb * MB
    multi_start = jnp.where(
        mvalid, pstart[jnp.minimum(msel, cap_mb * MB - 1)], -1)

    ok = _gate_ok.__wrapped__(
        codes, anchors, cpid, gaccept, gglen, ggdir,
        Lg=Lg, k=kk, band=band, indels=indels, n=int(n),
    )
    surv_count, ssel = compact_mask(ok & svalid, surv_cap)
    qvalid = ssel < hit_cap
    qidx = jnp.minimum(ssel, hit_cap - 1)
    surv_anchor = jnp.where(qvalid, anchors[qidx], -1)
    surv_sid = jnp.where(qvalid, cpid[qidx], -1)
    return jnp.concatenate([
        mb_count[None], hit_count[None], multi_count[None],
        surv_count[None],
        surv_anchor.astype(jnp.int32), surv_sid.astype(jnp.int32),
        multi_start.astype(jnp.int32),
    ])
