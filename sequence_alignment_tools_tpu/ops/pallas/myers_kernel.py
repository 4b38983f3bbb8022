"""Myers bit-parallel k-edit scan: the Sellers candidate set at ~25
ops/char instead of a row DP.

The reference's k-error engine is Wu-Manber bit-parallelism over k+1
row vectors (``shift_and_inexact.cc:249-350``); Myers' 1999 bit-vector
algorithm is its modern form — ONE pair of delta vectors (Pv, Mv) per
pattern encodes the whole DP column as bits, and each text character
costs ~15 word ops regardless of k.  The row-vectorized Sellers kernel
(:mod:`..sellers`) pays ``sum(len_p) * ~14`` plane-ops per text
position; this kernel pays ``P * ~25`` WORD-ops per position — an ~8x
cut for the bench pattern geometry — by walking text SEQUENTIALLY per
lane:

- the text is SEGMENT-TRANSPOSED: each of the 1024 (sublane, lane)
  cells of a tile owns a contiguous text segment and processes one char
  per step, so a [8, 128] plane step advances 1024 positions at once;
- per pattern, the Myers state (Pv, Mv, score) lives in VMEM scratch
  [8, 128] planes persisting across the 32-char group grid steps;
- each segment re-processes a 32-char left halo to warm the state: a
  <= k-edit match spans <= Lmax + k text chars, so fresh-start columns
  agree with infinite-history columns wherever the score is <= k (the
  only thing tested) — requires ``Lmax + k <= 32``;
- at an EOS character the state resets to the fresh column and the hit
  test is suppressed: Sellers disallows every error transition on EOS
  (all paths must start after it), which is exactly a fresh start;
- hits are packed per char as a P-bit pattern mask and the (rare)
  nonzero lanes compact in-kernel through the slots shift network; the
  XLA epilogue expands (slot, char) pairs with O(candidates) gathers.

Semi-global recurrence (free text start; score = min edits of pattern
vs some window ending here), per text char:

    Eq = B[pattern, class(char)]
    Xv = Eq | Mv;  Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
    Ph = Mv | ~(Xh | Pv);  Mh = Pv & Xh
    score += (Ph >> (m-1)) & 1;  score -= (Mh >> (m-1)) & 1
    Ph <<= 1;  Mh <<= 1                 (dp[0][j] = 0: shift in zeros)
    Pv = Mh | ~(Xv | Ph);  Mv = Ph & Xv

The int32 add in Xh carries within the word — which is the algorithm's
point — so packing two patterns into one word needs a zero GUARD bit
between the fields: both addend bits are 0 there, so the carry dies at
the guard and the fields stay independent (see :func:`myers_eqbits`).
Pairing compatible patterns nearly halves the per-char word count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MY_GROUP = 32      # chars per grid step (= bits per hit word)
MY_HALO = 32       # warmup chars per segment; bounds Lmax + k
MY_LANES = 1024    # segments per tile (8 sublanes x 128 lanes)


def _lsr(x, n):
    return jax.lax.shift_right_logical(x, n)


def _s32(v: int) -> int:
    """Wrap an unsigned 32-bit mask to the signed value jnp.int32 takes
    (packed fields legitimately reach bit 31)."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _myers_kernel(x_ref, out_ref, cnt_ref, pv_ref, mv_ref, sc_ref, *,
                  eqwords: tuple, wordspec: tuple, lens: tuple,
                  classes: tuple, eos: int, k: int, ngroups: int,
                  cap: int):
    """One 32-char group for all 1024 segments of a tile.

    x_ref: [1, 256, 128] uint8 — rows 8c..8c+7 = char c's [8, 128] code
    plane.  State is per WORD, not per pattern: wordspec[w] = (pA, pB)
    packs up to two patterns into one int32 word (field A at bits
    [0, mA), a zero GUARD bit at mA — the ``(Eq & Pv) + Pv`` carry dies
    there because both addend bits are 0 — and field B at bits
    [mA+1, mA+1+mB); pB = -1 for singletons).  Scratch: pv/mv
    [NW * 8, 128] int32, sc [P * 8, 128] (scores stay per pattern),
    persisting across the group axis (grid innermost).
    out_ref: [1, 33 * 8, 128] int32 — plane 0 = compacted slot meta
    ``(lane << 8) | sublane`` + 1 marker, planes 1 + c = char c's P-bit
    hit mask, each row-compacted to the row front.  cnt_ref: [1, 8, 128]
    — per-sublane-row compacted slot count (never exceeds 128: the
    "slots" are lanes, so overflow is impossible)."""
    P = len(lens)
    NW = len(wordspec)
    g = pl.program_id(1)

    def word_ones(w):
        pa, pb = wordspec[w]
        ones = (1 << lens[pa]) - 1
        if pb >= 0:
            ones |= ((1 << lens[pb]) - 1) << (lens[pa] + 1)
        return _s32(ones)

    @pl.when(g == 0)
    def _():
        for w in range(NW):
            pv_ref[8 * w : 8 * w + 8, :] = jnp.full(
                (8, 128), word_ones(w), jnp.int32)
            mv_ref[8 * w : 8 * w + 8, :] = jnp.zeros((8, 128), jnp.int32)
        for p in range(P):
            sc_ref[8 * p : 8 * p + 8, :] = jnp.full(
                (8, 128), lens[p], jnp.int32)

    pv = [pv_ref[8 * w : 8 * w + 8, :] for w in range(NW)]
    mv = [mv_ref[8 * w : 8 * w + 8, :] for w in range(NW)]
    sc = [sc_ref[8 * p : 8 * p + 8, :] for p in range(P)]

    # DNA fast path: classes are exactly codes (0, 1, 2, 3) — eq comes
    # from a 2-level select tree over the code's bit planes (3 selects
    # per word vs 2 ops per live class).  At EOS the tree yields class
    # 0's bits, which is harmless: the per-word EOS reset overrides the
    # state and the hit test uses the reset score.
    tree_eq = classes == (0, 1, 2, 3)

    words = []
    for c in range(MY_GROUP):
        x = x_ref[0, 0, 8 * c : 8 * c + 8, :].astype(jnp.int32)
        at_eos = x == eos
        if tree_eq:
            x0 = (x & 1) > 0
            x1 = (x & 2) > 0
        else:
            sel = [x == cls for cls in classes]
        w_hits = jnp.zeros((8, 128), jnp.int32)
        for w in range(NW):
            pa, pb = wordspec[w]
            ones = jnp.int32(word_ones(w))
            if tree_eq:
                b0, b1, b2, b3 = (jnp.int32(eqwords[w][ci])
                                  for ci in range(4))
                eq = jnp.where(x1, jnp.where(x0, b3, b2),
                               jnp.where(x0, b1, b0))
            else:
                eq = jnp.zeros((8, 128), jnp.int32)
                for ci in range(len(classes)):
                    b = eqwords[w][ci]
                    if b:
                        eq = eq | jnp.where(sel[ci], jnp.int32(b), 0)
            xv = eq | mv[w]
            xh = (((eq & pv[w]) + pv[w]) ^ pv[w]) | eq
            ph = mv[w] | ~(xh | pv[w])
            mh = pv[w] & xh
            tops = [(pa, lens[pa] - 1)]
            if pb >= 0:
                tops.append((pb, lens[pa] + lens[pb]))
            svals = []
            for p, top in tops:
                svals.append(
                    (p, sc[p] + (_lsr(ph, top) & 1) - (_lsr(mh, top) & 1)))
            ph = ph << 1
            mh = mh << 1
            if pb >= 0:
                # zero the bit shifted into field B's start (field A's
                # guard content — the semi-global free start shifts 0 in)
                smask = jnp.int32(_s32(~(1 << (lens[pa] + 1))))
                ph = ph & smask
                mh = mh & smask
            npv = (mh | ~(xv | ph)) & ones
            nmv = (ph & xv) & ones
            pv[w] = jnp.where(at_eos, ones, npv)
            mv[w] = jnp.where(at_eos, 0, nmv)
            for p, s in svals:
                sc[p] = jnp.where(at_eos, lens[p], s)
                # lens[p] > k always, so the reset score also encodes
                # the EOS hit suppression
                hit = sc[p] <= k
                w_hits = w_hits | jnp.where(hit, jnp.int32(1 << p), 0)
        words.append(w_hits)

    for w in range(NW):
        pv_ref[8 * w : 8 * w + 8, :] = pv[w]
        mv_ref[8 * w : 8 * w + 8, :] = mv[w]
    for p in range(P):
        sc_ref[8 * p : 8 * p + 8, :] = sc[p]

    # compact lanes with any hit this group; payload = meta + 32 words
    from .scan_kernel import _row_compact

    anyw = words[0]
    for c in range(1, MY_GROUP):
        anyw = anyw | words[c]
    hit = anyw != 0
    li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    meta = (li << 8) | si | jnp.int32(1 << 16)  # nonzero marker
    hit32 = hit.astype(jnp.int32)
    pfx = hit32
    s = 1
    while s < 128:
        pfx = pfx + jnp.where(li >= s, pltpu.roll(pfx, shift=s, axis=1), 0)
        s *= 2
    rowcnt = pfx[:, 127:128]
    out = _row_compact([meta] + words, hit, rowcnt, 128, cap)
    for q in range(1 + MY_GROUP):
        out_ref[0, 8 * q : 8 * q + 8, :] = out[q]
    cnt_ref[0] = jnp.broadcast_to(rowcnt, (8, 128))


@functools.partial(
    jax.jit,
    static_argnames=("eqwords", "wordspec", "lens", "classes", "eos",
                     "k", "interpret"),
)
def pallas_myers_kernel(x4, *, eqwords: tuple, wordspec: tuple,
                        lens: tuple, classes: tuple, eos: int, k: int,
                        interpret: bool = False):
    """The Mosaic half of the Myers scan: (slots, counts) raw kernel
    outputs.  SEPARATE jit from the cap-dependent epilogue
    (:func:`pallas_myers_epilogue`) so overflow retries with bigger
    caps never re-trigger the multi-minute Mosaic kernel compile —
    they re-run only the tiny XLA gather over the SAME kernel outputs."""
    ntiles = x4.shape[0]
    ngroups = x4.shape[1]
    P = len(lens)
    NW = len(wordspec)
    slots, counts = pl.pallas_call(
        functools.partial(
            _myers_kernel, eqwords=eqwords, wordspec=wordspec,
            lens=lens, classes=classes, eos=eos, k=k, ngroups=ngroups,
            cap=128,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (ntiles * ngroups, (1 + MY_GROUP) * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((ntiles * ngroups, 8, 128), jnp.int32),
        ),
        grid=(ntiles, ngroups),
        in_specs=[
            pl.BlockSpec((1, 1, 8 * MY_GROUP, 128),
                         lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, (1 + MY_GROUP) * 8, 128),
                         lambda i, g: (i * ngroups + g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, g: (i * ngroups + g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8 * NW, 128), jnp.int32),
            pltpu.VMEM((8 * NW, 128), jnp.int32),
            pltpu.VMEM((8 * P, 128), jnp.int32),
        ],
        interpret=interpret,
    )(x4)
    return slots, counts


@functools.partial(
    jax.jit,
    static_argnames=("ntiles", "ngroups", "segc", "slot_cap", "pair_cap",
                     "n"),
)
def pallas_myers_epilogue(slots, counts, *, ntiles: int, ngroups: int,
                          segc: int, slot_cap: int = 1024,
                          pair_cap: int = 4096, n: int = 0):
    """XLA epilogue over the Myers kernel outputs.  Returns ONE packed
    int32 row:

        [npairs, nslots, pos x pair_cap, mask x pair_cap]

    where (pos, mask) are candidate 0-based boundary-start positions
    (the Sellers contract emits end = pos + 1) and mask bit p = pattern
    p has mindist <= k there.  npairs > pair_cap or nslots > slot_cap
    means overflow: the caller retries with bigger caps against the
    SAME kernel outputs (correctness never depends on capacity).
    Positions in the halo or past ``n`` are dropped here, not in the
    kernel.  O(candidates): gather live slots, expand their 32-char
    windows to (pos, mask) pairs."""
    from ..compact import compact_mask

    R = ntiles * ngroups * 8
    rc = jnp.minimum(counts[:, :, 0].reshape(R), 128)
    cum = jnp.cumsum(rc)
    nslots = cum[R - 1]
    j = jax.lax.broadcasted_iota(jnp.int32, (slot_cap,), 0)
    row = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    rows = jnp.minimum(row, R - 1)
    s = j - (cum[rows] - rc[rows])
    s = jnp.minimum(s, 127)
    blk = rows >> 3
    r = rows & 7
    s3 = slots.reshape(ntiles * ngroups, 1 + MY_GROUP, 8, 128)
    meta = s3[blk, 0, r, s]
    lane = (meta >> 8) & 0xFF
    sub = meta & 0xFF
    svalid = (j < nslots) & (meta != 0)
    # segment id and text position of char 0 of this slot's group
    i_t = blk // ngroups
    g_t = blk % ngroups
    seg = (i_t * MY_LANES) + sub * 128 + lane
    base = seg * segc + (g_t * MY_GROUP - MY_HALO)  # int32: n <= 2^28
    wmat = s3[blk[:, None], 1 + jnp.arange(MY_GROUP)[None, :], r[:, None],
              s[:, None]]  # [slot_cap, 32]
    cpos = base[:, None] + jnp.arange(MY_GROUP, dtype=jnp.int32)[None, :]
    live = (svalid[:, None] & (wmat != 0)
            & (cpos >= 0) & (cpos < n)
            & (g_t[:, None] * MY_GROUP + jnp.arange(MY_GROUP)[None, :]
               >= MY_HALO))
    npairs, sel = compact_mask(live.reshape(-1), pair_cap)
    pvalid = sel < slot_cap * MY_GROUP
    pidx = jnp.minimum(sel, slot_cap * MY_GROUP - 1)
    ppos = jnp.where(pvalid, cpos.reshape(-1)[pidx], -1)
    pmask = jnp.where(pvalid, wmat.reshape(-1)[pidx], 0)
    return jnp.concatenate([
        npairs[None], nslots[None],
        ppos.astype(jnp.int32), pmask.astype(jnp.int32),
    ])


_MYT_CACHE: dict = {}


def myers_transpose(codes: np.ndarray, eos_code: int, segc: int):
    """Segment-transposed device text form: [ntiles, ngroups, 256, 128]
    uint8 where block (i, g) rows 8c..8c+7 hold the [8, 128] code plane
    of group char c — segment s = i*1024 + r*128 + u covers text
    [s*segc - MY_HALO, (s+1)*segc), EOS-padded outside the array.
    Cached per (host array, segc) like the phase transpose."""
    import weakref

    key = (id(codes), segc)
    ent = _MYT_CACHE.get(key)
    if ent is not None and ent[0]() is codes:
        return ent[1]
    n = len(codes)
    nseg = max(-(-n // segc), 1)
    ntiles = -(-nseg // MY_LANES)
    ngroups = (MY_HALO + segc) // MY_GROUP
    total = ntiles * MY_LANES * segc
    padded = np.full(MY_HALO + total, eos_code, np.uint8)
    padded[MY_HALO : MY_HALO + n] = codes
    # [seg, char] matrix with per-segment left halo
    strided = np.lib.stride_tricks.sliding_window_view(
        padded, MY_HALO + segc)[::segc][: ntiles * MY_LANES]
    # -> [ntiles, sub, lane, group, char] -> [ntiles, group, char*8(sub), lane]
    m = np.ascontiguousarray(strided).reshape(
        ntiles, 8, 128, ngroups, MY_GROUP)
    x4 = np.ascontiguousarray(
        m.transpose(0, 3, 4, 1, 2).reshape(
            ntiles, ngroups, MY_GROUP * 8, 128))
    dev = jnp.asarray(x4)
    ref = weakref.ref(codes)
    weakref.finalize(codes, _MYT_CACHE.pop, key, None)
    _MYT_CACHE[key] = (ref, dev)
    return dev


def myers_eqbits(tables):
    """(eqwords, wordspec, lens, classes): the packed word layout for
    :func:`_myers_kernel`.

    Patterns pair greedily (longest-first first-fit) into int32 words
    when ``mA + 1 + mB <= 32`` — field A at bits [0, mA), a zero guard
    bit at mA, field B at [mA+1, mA+1+mB).  The kernel's per-char cost
    scales with WORDS, so pairing short patterns nearly halves it.
    eqwords[w][ci] is the combined accept mask of both fields for live
    class ci; wordspec[w] = (pA, pB) with pB = -1 for singletons."""
    t = tables
    classes = tuple(
        c for c in range(t.alpha)
        if c != t.eos_code and bool(np.any(t.match[:, :, c])))
    lens = tuple(int(t.lengths[p]) for p in range(t.P))

    def bits(p, c):
        b = 0
        for j in range(lens[p]):
            if t.match[p, j, c]:
                b |= 1 << j
        return b

    order = sorted(range(t.P), key=lambda p: -lens[p])
    used = [False] * t.P
    wordspec = []
    for i, pa in enumerate(order):
        if used[pa]:
            continue
        used[pa] = True
        mate = -1
        for pb in order[i + 1:]:
            if not used[pb] and lens[pa] + 1 + lens[pb] <= 32:
                mate = pb
                used[pb] = True
                break
        wordspec.append((pa, mate))
    eqwords = []
    for pa, pb in wordspec:
        row = []
        for c in classes:
            b = bits(pa, c)
            if pb >= 0:
                b |= bits(pb, c) << (lens[pa] + 1)
            row.append(_s32(b))
        eqwords.append(tuple(row))
    return tuple(eqwords), tuple(wordspec), lens, classes
