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


def kernel_weights(tables, k: int, poison_eos: bool):
    """(W8 [8*PPAD, KPAD] int8, thr8 [8*PPAD, 1] int32, classes tuple).

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

    w = conv_weights(tables, k, poison_eos).astype(np.float32)  # [L, A, P]
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
    base_cls = next(
        (c for c in classes if np.all(w[:, c, :] >= 0)), None)
    if base_cls is not None and len(classes) > 1:
        base_col = w[:, base_cls, :].copy()  # [L, P]
        w = w - base_col[:, None, :]
        base_tot = base_col.sum(axis=0)  # [P]
        classes = tuple(c for c in classes if c != base_cls)
    else:
        base_tot = np.zeros((P,), np.float32)
    nc = len(classes)
    na = _na(Lmax)
    K = nc * 8 * na + 1  # + bias lane
    KPAD = _round_up(K, LANE)
    PPAD = _round_up(max(P, 1), LANE)
    W8 = np.zeros((8 * PPAD, KPAD), dtype=np.float32)
    prow = np.arange(P) * 8
    for ci in range(nc):
        c = classes[ci]
        for r in range(8):
            for b0 in range(8):
                bp = (r + b0) % 8
                g = (r + b0) // 8
                for a0 in range((Lmax - 1 - b0) // 8 + 1 if b0 < Lmax
                                else 0):
                    j = 8 * a0 + b0
                    col = (ci * na + (a0 + g)) * 8 + bp
                    W8[prow + r, col] = w[j, c, :]
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


def _scan_kernel(codes_ref, next_ref, wt_ref, out_ref, yt_ref, acc_ref,
                 oh_ref, *, classes: tuple, U: int, na: int, kchunks: int,
                 plive: int, ptiles: int, occupancy: bool):
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
    pattern tiles the im2col build runs only at pattern-tile 0."""
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

    @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                             pl.program_id(1) == 0))
    def _():
        # static yt content, never written again: bias ones + K-pad zeros
        yt_ref[K - 1 : K, :] = jnp.ones((1, U), et)
        if K < KPAD:
            yt_ref[K:KPAD, :] = jnp.zeros((KPAD - K, U), et)

    def build():
        # widen once: int8/uint8 equality compares are unsupported by
        # this Mosaic target
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

    if ptiles == 1:
        build()
    else:
        # im2col depends only on the text tile; rebuild at pattern-tile 0
        @pl.when(pl.program_id(1) == 0)
        def _():
            build()

    if kchunks == 1:
        scores = jnp.dot(wt_ref[0, 0, :mlive, :], yt_ref[:],
                         preferred_element_type=pet)
    else:
        acc_ref[:] = jnp.zeros((mlive, U), jnp.int32)
        for kc in range(kchunks):
            acc_ref[:] += jnp.dot(
                wt_ref[0, kc, :mlive, :],
                yt_ref[kc * LANE : (kc + 1) * LANE],
                preferred_element_type=jnp.int32,
            )
        scores = acc_ref[:]
    def pattern_tree(s, op):
        # reduce the (pattern, phase) rows to the 8 phase rows; plive is
        # the EXACT live pattern count (not a power of two — pad rows
        # would cost tree work), so odd counts peel one 8-row block into
        # the head; every slice stays 8-row aligned
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

    if occupancy:
        # margins: max over patterns first, sign check last
        s = pattern_tree(scores, jnp.maximum)
        out_ref[0, 0] = (s >= 0).astype(jnp.bfloat16)
    else:
        # per-(phase, position) hit counts <= P <= 128: exact in bf16
        hit = (scores >= 0).astype(jnp.bfloat16)
        s = pattern_tree(hit, jnp.add)
        out_ref[0, 0] = s


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


@functools.partial(
    jax.jit,
    static_argnames=("classes", "Lmax", "T", "MB", "interpret", "n_pat",
                     "occupancy"),
)
def pallas_microhits(codes, W, thr, *, classes: tuple, Lmax: int,
                     T: int = 8192, MB: int = 32, interpret: bool = False,
                     n_pat: int | None = None, occupancy: bool = False,
                     t3=None):
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
    with ``occupancy=True``, a bool occupancy mask of the same shape
    (cheaper: the kernel reduces int32 margins by max and the microblock
    reduce is a bf16 max).
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

    out = pl.pallas_call(
        functools.partial(
            _scan_kernel, classes=classes, U=U, na=na, kchunks=kchunks,
            plive=plive, ptiles=ptiles, occupancy=occupancy,
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles, ptiles, 8, U),
                                       jnp.bfloat16),
        grid=(ntiles, ptiles),
        in_specs=[
            pl.BlockSpec((1, 8, U), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, U), lambda i, j: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kchunks, 8 * LANE, LANE),
                         lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, U), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kchunks * LANE, U), et),
            # single-chunk kernels feed the matmul output straight into
            # the reduce; the accumulator scratch shrinks to a dummy tile
            pltpu.VMEM((8 * plive, U) if kchunks > 1 else (8, LANE),
                       jnp.int32),
            pltpu.VMEM((8 * len(classes), U + na - 1), et),
        ],
        interpret=interpret,
    )(t3, t3, W4)
    # microblock m covers positions [MB*m, MB*(m+1)) = all 8 phases of G
    # consecutive lanes; reduce pattern tiles + phases, then lane groups
    if occupancy:
        o = out.reshape(ntiles, ptiles * 8, U).max(axis=1)
        return (o.reshape(ntiles, U // G, G).max(axis=2).reshape(-1) > 0)
    c = out.astype(jnp.float32).reshape(ntiles, ptiles * 8, U).sum(axis=1)
    return c.reshape(ntiles, U // G, G).sum(axis=2).reshape(-1)


def _microhits_impl(codes, W, thr, *, classes, Lmax, T, MB, interpret,
                    n_pat=None, occupancy=False, t3=None):
    """Non-jitted body of :func:`pallas_microhits` for fusion into larger
    jitted pipelines."""
    return pallas_microhits.__wrapped__(
        codes, W, thr, classes=classes, Lmax=Lmax, T=T, MB=MB,
        interpret=interpret, n_pat=n_pat, occupancy=occupancy, t3=t3,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "classes", "alpha", "Lmax", "eos_code", "T", "MB", "cap_mb",
        "hit_cap", "interpret"
    ),
)
def pallas_scan_hits(codes, W, thr, wconv, thresholds, lengths, t3=None, *,
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
                         occupancy=True, t3=t3)
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
        "interpret",
    ),
)
def pallas_scan_gated(codes, W, thr, wconv, thresholds, lengths,
                      gaccept, gglen, ggdir, t3=None, *,
                      classes: tuple, alpha: int, Lmax: int,
                      eos_code: int = -1, T: int = 4096, MB: int = 32,
                      cap_mb: int = 1024, hit_cap: int = 4096,
                      multi_cap: int = 256, surv_cap: int = 512,
                      Lg: int = 16, kk: int = 1, band: int = 1,
                      indels: bool = True, interpret: bool = False):
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
    mh = _microhits_impl(codes, W, thr, classes=classes, Lmax=Lmax, T=T,
                         MB=MB, interpret=interpret, n_pat=P,
                         occupancy=True, t3=t3)
    nmb = mh.shape[0]
    mb_count, mb_idx = compact_mask(mh, cap_mb)

    win_len = MB + Lmax - 1
    eos_fill = jnp.full(nmb * MB + win_len - n, max(eos_code, 0), jnp.uint8)
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

    hit_count, sel = compact_mask(cnt > 0, hit_cap)
    svalid = sel < cap_mb * MB
    sidx = jnp.minimum(sel, cap_mb * MB - 1)
    cstart = pstart[sidx]
    cpid = top_pid[sidx]
    anchors = cstart + lengths[cpid].astype(jnp.int32)

    # escape list: positions with >1 hitting seed (host rescans those
    # windows exactly and resolves ALL their seeds itself)
    multi_count, msel = compact_mask(cnt > 1, multi_cap)
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
