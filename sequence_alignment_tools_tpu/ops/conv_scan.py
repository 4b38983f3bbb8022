"""MXU correlation scan: exact and k-mismatch multi-pattern matching.

The TPU-native replacement for the reference's Aho-Corasick keyword tree and
shift-and scan loops (``keyword_tree.t:427-486``, ``shift_and.cc:218-254``):
multi-pattern matching *without indels* is a one-hot correlation

    score(i, p) = sum_j W[j, text[i+j], p]

evaluated as ``lax.conv_general_dilated`` over the whole block — which XLA
tiles onto the MXU.  ``score == L_p`` is an exact (or exact-with-wildcards)
match ending at ``i + L_p``; ``score >= L_p - k`` is a k-mismatch candidate
(EOS positions carry a poison weight so no window straddles an entry
boundary).  Candidate extraction is a device-side compaction
(``jnp.nonzero`` with a static capacity).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..utils.lazyjax import LazyModule, lazy_jit

# Deferred: host-routed one-shot runs (native shift-and / census) must not
# pay the first jax import (~2.5 s PJRT registration under the site-less
# ``sat`` launcher).  First device-path attribute access swaps in the
# real modules.
jax = LazyModule("jax", "jax", globals())
jnp = LazyModule("jax.numpy", "jnp", globals())


@lazy_jit(static_argnames=("cap_mb", "hit_cap", "gcap", "long_form"))
def _pack_group(stacked, *, cap_mb: int, hit_cap: int, gcap: int,
                long_form: bool):
    """Compact a stacked group of packed scan results to live entries.

    ``stacked``: [g, row] int32 — g packed rows from
    :func:`..pallas.scan_kernel.pallas_scan_hits` sharing one (cap_mb,
    hit_cap) layout.  Each row is almost entirely capacity padding (true
    counts are tiny on non-degenerate inputs), and on the tunneled
    transport fetch time scales with BYTES (~34 ms + n/14 MB/s), so
    fetching the padding dominated the whole scan pipeline.  This packs
    the group into ONE small row:

        [g true mb_counts][g true hit_counts]
        [gcap mb entries][gcap hit entries]([gcap mism entries])

    where the entry sections are each row's live prefix concatenated in
    row order (clamped to the caps).  The host re-segments with a cumsum
    of the clamped counts; if the clamped totals exceed ``gcap`` the host
    falls back to fetching the full stacked rows (rare — it also grows
    ``gcap`` for the next group).  Pure XLA: a cumsum + searchsorted
    segmented gather, no data-dependent shapes.
    """
    g = stacked.shape[0]
    mbc_true = stacked[:, 0]
    hc_true = stacked[:, 1]
    mbc = jnp.minimum(mbc_true, cap_mb)
    hc = jnp.minimum(hc_true, hit_cap)

    def seg_gather(counts, section):
        width = section.shape[1]
        cum = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
        pos = jax.lax.broadcasted_iota(jnp.int32, (gcap,), 0)
        row = jnp.clip(
            jnp.searchsorted(cum, pos, side="right") - 1, 0, g - 1)
        off = pos - cum[row]
        valid = pos < cum[g]
        src = row * width + jnp.minimum(off, width - 1)
        out = section.reshape(-1)[jnp.where(valid, src, 0)]
        return jnp.where(valid, out, 0)

    mb_sec = stacked[:, 2 : 2 + cap_mb]
    hit_sec = stacked[:, 2 + cap_mb : 2 + cap_mb + hit_cap]
    parts = [mbc_true, hc_true, seg_gather(mbc, mb_sec),
             seg_gather(hc, hit_sec)]
    if long_form:
        mism_sec = stacked[:, 2 + cap_mb + hit_cap : 2 + cap_mb + 2 * hit_cap]
        parts.append(seg_gather(hc, mism_sec))
    return jnp.concatenate(parts)


@functools.lru_cache(maxsize=None)
def _shared_scan_jit(classes, alpha, Lmax, eos_code, T, MB,
                     cap_mb, hit_cap, interpret):
    """One jitted fused-scan entry per static config, SHARED across
    scanner instances: a per-instance ``jax.jit`` wrapper would re-trace
    (and on a cold persistent cache, re-compile) for every scanner a CLI
    run builds."""
    from .pallas.scan_kernel import pallas_scan_hits

    @jax.jit
    def jfn(codes_dev, t3, W, thr, weights, thresholds, lengths,
            feed=None, ohp=None):
        return pallas_scan_hits(
            codes_dev, W, thr, weights, thresholds, lengths, t3,
            feed=feed, ohp=ohp,
            classes=classes, alpha=alpha, Lmax=Lmax, eos_code=eos_code,
            T=T, MB=MB, cap_mb=cap_mb, hit_cap=hit_cap,
            interpret=interpret,
        )

    return jfn


_DEV_CACHE: dict = {}
_T3_CACHE: dict = {}


def _device_form(codes):
    """uint8 device copy of a host code array, cached ACROSS scanner
    instances by host-array identity: engines rebuild scanners per run,
    and a resident database must not re-pay the host->device transfer
    (~0.3 s per 16 MB on the tunneled transport).  uint8 because codes <
    alpha <= 255 and int32 would quadruple the upload; kernels widen on
    device.  Entries drop with the host array (weakref finalizer)."""
    import weakref

    ent = _DEV_CACHE.get(id(codes))
    if ent is not None and ent[0]() is codes:
        return ent[1]
    dev = jnp.asarray(np.asarray(codes, np.uint8))
    ref = weakref.ref(codes)
    weakref.finalize(codes, _DEV_CACHE.pop, id(codes), None)
    _DEV_CACHE[id(codes)] = (ref, dev)
    # reverse map for the seam-mode hit veto (_emit): the ORIGINAL host
    # codes of a device array, without a device fetch
    _HOST_OF_DEV[id(dev)] = ref
    weakref.finalize(codes, _HOST_OF_DEV.pop, id(dev), None)
    return dev


_HOST_OF_DEV: dict = {}


def _host_of_dev(codes_dev):
    """Host codes behind a device array uploaded via :func:`_device_form`
    (None when unknown or already collected)."""
    ref = _HOST_OF_DEV.get(id(codes_dev))
    return None if ref is None else ref()


_BIT_CACHE: dict = {}
_bit_recode_jit = None


def _bit_form(codes_dev, lut_dev):
    """Mask-recoded device text for the bit-plane mode (uint8 gather
    through the scanner's 256-entry code->base-mask LUT), cached across
    scanner instances by device-array identity — one-time preprocessing
    per resident database, like the phase transpose."""
    import weakref

    global _bit_recode_jit
    key = (id(codes_dev), id(lut_dev))
    ent = _BIT_CACHE.get(key)
    # identity must be verified for BOTH keys: a new scanner's lut can
    # land on a dead lut's recycled id while the resident codes_dev
    # stays alive, and the stale entry would hand back text recoded
    # with the OLD class ids (the entry holds the lut strongly, so a
    # simple `is` check suffices)
    if ent is not None and ent[0]() is codes_dev and ent[2] is lut_dev:
        return ent[1]
    if _bit_recode_jit is None:
        _bit_recode_jit = jax.jit(
            lambda c, lut: lut[c.astype(jnp.int32)])
    dev = _bit_recode_jit(codes_dev, lut_dev)
    ref = weakref.ref(codes_dev)
    weakref.finalize(codes_dev, _BIT_CACHE.pop, key, None)
    _BIT_CACHE[key] = (ref, dev, lut_dev)
    return dev


_WPK_CACHE: dict = {}


def _wpk_form(codes_dev, T: int, eos: int):
    """Packed-window device form (scan_kernel.wpack_transpose), cached
    across scanner instances by device-array identity."""
    import weakref

    key = (id(codes_dev), T, eos)
    ent = _WPK_CACHE.get(key)
    if ent is not None and ent[0]() is codes_dev:
        return ent[1]
    from .pallas.scan_kernel import wpack_transpose

    wpk = wpack_transpose(codes_dev, T=T, eos=eos)
    ref = weakref.ref(codes_dev)
    weakref.finalize(codes_dev, _WPK_CACHE.pop, key, None)
    _WPK_CACHE[key] = (ref, wpk)
    return wpk


_IMCOL_CACHE: dict = {}
_OHP_CACHE: dict = {}


def _ohp_form(codes_dev, T: int, classes: tuple):
    """Precomputed one-hot class planes (scan_kernel.ohp_transpose),
    cached across scanner instances by device-array identity."""
    import weakref

    key = (id(codes_dev), T, classes)
    ent = _OHP_CACHE.get(key)
    if ent is not None and ent[0]() is codes_dev:
        return ent[1]
    from .pallas.scan_kernel import ohp_transpose

    ohp = ohp_transpose(codes_dev, T=T, classes=classes)
    ref = weakref.ref(codes_dev)
    weakref.finalize(codes_dev, _OHP_CACHE.pop, key, None)
    _OHP_CACHE[key] = (ref, ohp)
    return ohp


def _imcol_form(codes_dev, T: int, classes: tuple, na: int, KPAD: int):
    """Precomputed im2col feed (scan_kernel.imcol_transpose), cached
    across scanner instances by device-array identity + class geometry.
    ~KPAD/8 bytes per base of HBM — the caller bounds eligibility."""
    import weakref

    key = (id(codes_dev), T, classes, na, KPAD)
    ent = _IMCOL_CACHE.get(key)
    if ent is not None and ent[0]() is codes_dev:
        return ent[1]
    from .pallas.scan_kernel import imcol_transpose

    feed = imcol_transpose(codes_dev, T=T, classes=classes, na=na,
                           KPAD=KPAD)
    ref = weakref.ref(codes_dev)
    weakref.finalize(codes_dev, _IMCOL_CACHE.pop, key, None)
    _IMCOL_CACHE[key] = (ref, feed)
    return feed


def _t3_form(codes_dev, T: int):
    """Phase-transposed device form, cached across scanner instances by
    device-array identity (the transpose is byte-shuffle-bound at ~3x the
    scan kernel's cost)."""
    import weakref

    key = (id(codes_dev), T)
    ent = _T3_CACHE.get(key)
    if ent is not None and ent[0]() is codes_dev:
        return ent[1]
    from .pallas.scan_kernel import _phase_transpose_jit

    t3 = _phase_transpose_jit(codes_dev, T=T)
    ref = weakref.ref(codes_dev)
    weakref.finalize(codes_dev, _T3_CACHE.pop, key, None)
    _T3_CACHE[key] = (ref, t3)
    return t3


@functools.lru_cache(maxsize=None)
def _shared_gated_jit(classes, alpha, Lmax, eos_code, T, MB, cap_mb,
                      hit_cap, multi_cap, surv_cap, Lg, kk, band, indels,
                      interpret, exact_pos):
    """One jitted gated-scan entry per static config, shared across
    scanner instances (see :func:`_shared_scan_jit`)."""
    from .pallas.scan_kernel import pallas_scan_gated

    @jax.jit
    def jfn(codes_dev, t3, W, thr, weights, thresholds, lengths,
            gaccept, gglen, ggdir):
        return pallas_scan_gated(
            codes_dev, W, thr, weights, thresholds, lengths,
            gaccept, gglen, ggdir, t3,
            classes=classes, alpha=alpha, Lmax=Lmax, eos_code=eos_code,
            T=T, MB=MB, cap_mb=cap_mb, hit_cap=hit_cap,
            multi_cap=multi_cap, surv_cap=surv_cap, Lg=Lg, kk=kk,
            band=band, indels=indels, interpret=interpret,
            exact_pos=exact_pos,
        )

    return jfn


@lazy_jit(static_argnames=("alpha", "cap"))
def _conv_scan_block(codes, weights, thresholds, lengths, alpha, cap):
    """One text block.

    codes: [B + Lmax - 1] int32 (right halo of Lmax-1, EOS-padded)
    weights: [Lmax, alpha, P] bf16; thresholds/lengths: [P] f32/int32
    Returns ONE packed int32 array [1 + 2*cap]: (count, flat_idx...,
    mism...) where flat_idx indexes the [B, P] (window-start, pattern)
    grid row-major; mism = L_p - score.  Single output because each
    extra jit output costs a transport round-trip on this backend.

    The correlation is evaluated as Lmax shifted [B, A] @ [A, P] matmuls
    (MXU) rather than one huge-spatial-dim conv, which XLA compiles far
    better at this shape.
    """
    Lmax = weights.shape[0]
    B = codes.shape[0] - (Lmax - 1)
    codes = codes.astype(jnp.int32)  # shipped uint8 (4x less transport)
    onehot = jax.nn.one_hot(codes, alpha, dtype=jnp.bfloat16)  # [B+Lmax-1, A]

    def step(j, acc):
        window = jax.lax.dynamic_slice_in_dim(onehot, j, B, axis=0)  # [B, A]
        return acc + jnp.dot(
            window, weights[j], preferred_element_type=jnp.float32
        )

    out = jax.lax.fori_loop(
        0, Lmax, step, jnp.zeros((B, weights.shape[2]), jnp.float32)
    )  # [B, P]
    from .compact import compact_mask

    mism = lengths[None, :].astype(jnp.float32) - out
    hit = out >= thresholds[None, :]
    count, idx = compact_mask(hit.reshape(-1), cap)
    m = jnp.concatenate([mism.reshape(-1), jnp.zeros((1,), jnp.float32)])
    return jnp.concatenate(
        [count[None], idx.astype(jnp.int32), m[idx].astype(jnp.int32)]
    )


class ConvScanner:
    """Block-streaming exact / k-mismatch scanner over a flat code array.

    Yields candidates as (end_position, pattern_index_0based, mismatches),
    globally ordered by (window_start, pattern).
    """

    def __init__(self, tables, k: int = 0, poison_eos: bool | None = None,
                 block: int = 1 << 19, cap: int = 1 << 16,
                 use_pallas: bool | None = None):
        from .tables import conv_weights

        del conv_weights  # lazy (see _wtl)
        self.tables = tables
        self.k = k
        if poison_eos is None:
            poison_eos = k > 0
        self.poison_eos = poison_eos
        self.block = block
        self.cap = cap
        # LAZY device state: constructing a scanner must not initialize
        # the jax backend (a one-shot CLI run that the host machines
        # serve never needs it, and backend init on the tunneled chip
        # costs ~1 s; the bench parent also holds the single-client
        # tunnel while its one-shot children run)
        self._use_pallas_c = use_pallas
        self._wtl_c = None
        self.pallas_interpret = False  # tests: run the Mosaic kernel on CPU
        self._pallas_wt = None
        self._dispatch_cache = {}

    @property
    def use_pallas(self):
        if self._use_pallas_c is None:
            # the Mosaic kernel needs a real TPU; Lmax limit of the
            # current kernel (pattern count is unlimited: sets past
            # _PBLOCK scan as a pattern-blocked outer loop)
            self._use_pallas_c = (
                jax.default_backend() not in ("cpu",)
                and self.tables.Lmax <= 128
            )
        return self._use_pallas_c

    @use_pallas.setter
    def use_pallas(self, v):
        self._use_pallas_c = v

    def _wtl(self):
        """(weights, thresholds, lengths) device arrays, built on first
        device-path use."""
        if self._wtl_c is None:
            from .tables import conv_weights

            t = self.tables
            self._wtl_c = (
                jnp.asarray(conv_weights(t, self.k, self.poison_eos)),
                jnp.asarray(t.lengths.astype(np.float32) - float(self.k)),
                jnp.asarray(t.lengths),
            )
        return self._wtl_c

    @property
    def weights(self):
        return self._wtl()[0]

    @property
    def thresholds(self):
        return self._wtl()[1]

    @property
    def lengths_dev(self):
        return self._wtl()[2]

    # -- route announcements (VERDICT r2 item 10) ----------------------------

    _routes_done = None

    def _route(self, msg: str) -> None:
        """Name the kernel route actually taken, once per scanner, as a
        reference-style '-v' strategy line (select.cc announcement
        spirit) — so degraded fallbacks are visible.  'Route:' lines
        are framework-native (the reference has none); parity harnesses
        filter them like Progress lines.  Verbose mode (progress
        reporter attached) or SAT_ROUTE_VERBOSE=1 enables them."""
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

    # -- multi-chip routing ---------------------------------------------------

    # a jax.sharding.Mesh attached by the model layer (parallel.shard.
    # auto_mesh: real multi-chip slices auto-shard, tests opt in with
    # SAT_MESH=N on the virtual CPU mesh); scans route through the
    # sharded fused pipeline when the Mosaic kernel could serve them
    mesh = None

    def _sharded_capable(self) -> bool:
        return (self.mesh is not None
                and self.mesh.devices.size > 1
                and self.tables.P <= 2048
                and self.tables.Lmax <= 128)

    def _mesh_interpret(self) -> bool:
        # on the virtual CPU mesh the Mosaic kernel runs in interpreter
        # mode; real device meshes compile it
        return self.pallas_interpret or jax.default_backend() == "cpu"

    # -- Pallas coarse filter + microblock rescan ---------------------------

    _MB = 32
    _RESCAN = 2048  # rescan bucket (positions), fixed for compile caching

    _bitplane_cc = False  # False = uncomputed; None = ineligible

    def _bitplane_mode(self):
        """IUPAC bit-plane mode for wide-alphabet EXACT scans: when the
        accept relation factors as "4-bit base-set intersection
        non-empty" (the -w IUPAC semantics, shift_and.cc:108-117), the
        resident text is recoded to 4-bit base MASKS and the Mosaic
        filter builds 4 BIT planes (``(text >> b) & 1``) instead of one
        plane per live class — the kernel's measured bound is exactly
        those per-class compare+copy passes (README roofline), and wide
        alphabets pay ~14 of them.  The bit-plane margin counts
        ``sum_j |text_set_j ∩ pattern_set_j|``, which is >= L for every
        true hit (each true position intersects), so the filter is a
        SUPERSET of the class form — the exact in-pipeline rescore
        (reindexed over mask values, exactness verified structurally
        below) rejects the extras.  Returns None when ineligible (k>0,
        poison, non-factorable accepts, few classes, mesh) — the class
        planes are used unchanged.  The embedding is derived from the
        accept tables themselves (minimal accept sets = base stars) and
        VERIFIED against every (pattern, position, code) triple, so a
        wrong guess degrades to None, never to wrong output."""
        if self.mesh is not None and self.mesh.devices.size > 1:
            # the single-chip dispatch never runs bit modes under a
            # mesh; the SHARDED pipeline consults _bitmode_nomesh and
            # recodes before sharding (parallel.shard)
            return None
        return self._bitmode_any()

    def _bitmode_nomesh(self):
        """The bit-plane mode ignoring the mesh attachment — shared by
        the single-chip dispatch and the sharded pipeline (which
        applies the LUT recode host-side before sharding).  The SEAM
        variant is single-chip-only (its hit veto lives in _emit and
        needs the un-sharded host codes), so sharded callers see None
        for it and fall back to the class planes."""
        cc = self._bitmode_any()
        if cc is not None and cc.get("seam"):
            return None
        return cc

    def _bitmode_any(self):
        if self._bitplane_cc is not False:
            return self._bitplane_cc
        self._bitplane_cc = None
        cc = self._bitplane_iupac()
        if cc is None:
            cc = self._exact_encode_cc()
        self._bitplane_cc = cc
        return cc

    def _bitplane_iupac(self):
        t = self.tables
        if (self.k != 0 or self.poison_eos or t.alpha > 64
                or os.environ.get("SAT_BITPLANES", "1") != "1"):
            return None
        if t.code_chars is None:
            return None
        acc = np.asarray(t.match)  # [P, Lmax, alpha] bool
        P, Lmax, alpha = acc.shape
        if not P:
            return None
        live = [c for c in range(alpha) if acc[:, :, c].any()]
        if len(live) < 6:
            return None  # the class planes are already cheap
        # code -> 4-bit DNA base set (A=1, C=2, G=4, T=8), from the
        # IUPAC CONTAINS table (U counts as T); 0 for non-IUPAC chars
        from ..utils.iupac import CONTAINS

        bit_of = {"A": 1, "C": 2, "G": 4, "T": 8, "U": 8}
        tcb = np.zeros(alpha, np.uint8)
        for c in range(alpha):
            for ch in CONTAINS.get(chr(t.code_chars[c]).upper(), ""):
                tcb[c] |= bit_of.get(ch, 0)
        # filter mask per (pattern, position): the OR of the accepted
        # PURE-BASE codes' bits — for the IUPAC compatible relation this
        # reconstructs the pattern char's own base set (every base of
        # set_p is an accepted singleton), which every accepted code
        # intersects; positions where that is unsound (table quirks,
        # exact-match-on-ambiguity-code accepts) widen to the union of
        # all accepted codes' sets, and the usefulness guard below
        # declines if the masks degenerate toward all-bits
        acc_any = acc.any(axis=2)  # [P, Lmax]
        single = np.zeros((P, Lmax), np.uint8)
        for c in range(alpha):
            if tcb[c] in (1, 2, 4, 8):
                single |= np.where(acc[:, :, c], tcb[c], 0).astype(
                    np.uint8)
        fpb = single
        inter = (tcb[None, None, :] & fpb[:, :, None]) != 0
        bad_pos = np.argwhere((acc & ~inter).any(axis=2))
        if len(bad_pos) > 100_000:
            return None
        for p, j in bad_pos:
            # a quirk accept outside the char's own base set (e.g. the
            # reference's COMPATIBLE["T"] listing V, iupac.py:18-37):
            # widen MINIMALLY — greedy bit cover of the violating codes
            # (the full accepted-union measured fpb = all-bits at every
            # T position, which collapsed the filter's selectivity)
            cur = int(fpb[p, j])
            viol = [c for c in range(alpha)
                    if acc[p, j, c] and not (tcb[c] & cur)]
            while viol:
                cnt = [sum(1 for c in viol if (tcb[c] >> b) & 1)
                       for b in range(4)]
                b = int(np.argmax(cnt))
                if cnt[b] == 0:
                    return None  # an accepted code with mask 0
                cur |= 1 << b
                viol = [c for c in viol if not (tcb[c] & cur)]
            fpb[p, j] = cur
        # SOUNDNESS check: every accepted code must intersect the filter
        # mask (the bit filter is then a superset of the true accept;
        # the exact rescore below rejects the extras)
        inter = (tcb[None, None, :] & fpb[:, :, None]) != 0
        if (acc & ~inter).any():
            return None
        # mask-injectivity for the exact rescore reindex: live codes
        # sharing a base mask must have identical accept columns
        for i, c1 in enumerate(live):
            if tcb[c1] == 0:
                return None
            for c2 in live[i + 1 :]:
                if tcb[c1] == tcb[c2] and not (
                        acc[:, :, c1] == acc[:, :, c2]).all():
                    return None
        # usefulness guard: wide filter masks admit most of the text and
        # shift all the work to the rescore — decline degenerate sets
        if float(np.unpackbits(fpb[acc_any]).sum()) > \
                2.5 * float(acc_any.sum()):
            return None
        from .pallas.scan_kernel import BITCLS, kernel_weights

        bitcls = tuple(BITCLS + b for b in range(4)
                       if ((fpb >> b) & 1).any())
        if not bitcls or len(bitcls) + 1 >= len(live):
            return None  # no pass-count win over the folded class form
        wbit = np.zeros((Lmax, len(bitcls), P), np.float32)
        for ci, c in enumerate(bitcls):
            wbit[:, ci, :] = ((fpb >> (c - BITCLS)) & 1).T
        W, thr, classes = kernel_weights(t, 0, False,
                                         bitw=(wbit, bitcls))
        # exact rescore weights, REINDEXED by mask value: the recode is
        # injective on live codes (checked above), so this is the true
        # accept table in mask space
        wconv16 = np.zeros((Lmax, 16, P), np.float32)
        for c in live:
            np.maximum(wconv16[:, tcb[c], :],
                       acc[:, :, c].T.astype(np.float32),
                       out=wconv16[:, tcb[c], :])
        # DEAD codes (accepted by nothing — EOS, stray chars, quirk
        # exclusions like text-U vs a K pattern) recode to mask 0, which
        # no wconv16 column accepts: recoding them to their CONTAINS
        # mask would ALIAS any live code sharing that mask (U vs T both
        # map to 8) and the mask-space rescore — injective only on live
        # codes — would accept them where the reference rejects.
        lut = np.zeros(256, np.uint8)
        live_mask = np.zeros(alpha, bool)
        live_mask[live] = True
        lut[:alpha] = np.where(live_mask, tcb, 0)
        self._route(
            "wide-alphabet BIT-PLANE filter (%d live classes -> %d bit "
            "planes + exact rescore)" % (len(live), len(bitcls)))
        return {
            "W": jnp.asarray(W), "thr": jnp.asarray(thr),
            "classes": classes,
            "wconv": jnp.asarray(wconv16),
            "lut": jnp.asarray(lut),
            "alpha_r": 16, "eos_r": 0,
        }

    def _exact_encode_cc(self):
        """Exact class-ENCODE bit planes for wide-alphabet EXACT scans
        whose accept sets don't factor as IUPAC base sets — the peptide
        regime (``peptide_scan`` exact AA matching over ~20 live
        classes, peptide_scan.cc via primer_match.cc:1114's shared scan
        stack).  Live codes are grouped into equivalence classes by
        accept-COLUMN equality; when every accept set is exactly one
        such class (true for any exact matcher, incl. case folding),
        each class gets a B-bit id (B = ceil(log2(ncls + 1)); one spare
        id is the DEAD id for never-accepted codes and EOS) and the
        filter scans B bit planes of the recoded text with +/-1 weights:
        margin = #(pattern-bit 1, text-bit 1) - #(pattern-bit 0,
        text-bit 1) peaks at the pattern's total 1-bit count npos_p,
        and ANY wrong char at any position loses at least 1 (its id
        differs in >= 1 bit) — so margin >= npos_p is an EXACT filter
        (EOS-straddling windows are rejected structurally: the dead id
        differs from every live id).  The in-pipeline rescore still
        runs (same machinery as the IUPAC mode, reindexed over class
        ids) and is cheap because the candidate set is just the true
        hits.  ~20 class compare+copy passes become 5 bit-plane passes
        — the kernel's measured bound (README roofline)."""
        t = self.tables
        if (self.k != 0 or self.poison_eos
                or os.environ.get("SAT_BITPLANES", "1") != "1"
                or os.environ.get("SAT_EXACTCODE", "1") != "1"):
            return None
        acc = np.asarray(t.match)  # [P, Lmax, alpha] bool
        P, Lmax, alpha = acc.shape
        if not P:
            return None
        live = [c for c in range(alpha) if acc[:, :, c].any()]
        if not live:
            return None
        # SEAM mode (the DNA exact headline regime): exactly 4 live
        # singleton classes fit 2 bit planes with NO dead id — one
        # fewer build pass than the folded class form's 3.  Dead codes
        # (EOS entry separators, rare non-base chars) then ALIAS class
        # id 0 in both the filter and the in-pipeline rescore, so every
        # emitted hit is re-verified host-side against the ORIGINAL
        # codes (_emit's seam veto) — trace dead content is free,
        # N-flooded corpora are declined by _seam_probe's density gate.
        # default OFF: measured interleaved on-chip on the 16 MB DNA
        # headline, 2 planes lose ~2% vs the folded 3-class form
        # (19.4-19.5 vs 19.7 Gb/s) — at DNA's pass count the kernel is
        # NOT build-bound, unlike the >= 6-class regimes (README).
        # Kept testable as a shipped refutation, like the ohp feed.
        seam_ok = (len(live) == 4
                   and os.environ.get("SAT_SEAMCODE", "0") == "1"
                   and not self._seam_disabled)
        if len(live) < 6 and not seam_ok:
            return None  # the folded class planes are already cheap
        # equivalence classes of live codes by accept-column equality
        col_of = {}
        clsid = np.full(alpha, -1, np.int64)
        for c in live:
            key = acc[:, :, c].tobytes()
            if key not in col_of:
                # seam ids 0.. (no dead id); standard ids 1.. (0 = dead)
                col_of[key] = len(col_of) + (0 if seam_ok else 1)
            clsid[c] = col_of[key]
        ncls = len(col_of)
        if seam_ok and ncls != 4:
            return None  # repeated columns under 4 classes: class
            # planes are already <= 2 passes
        nbits = (2 if seam_ok
                 else max(1, int(np.ceil(np.log2(ncls + 1)))))
        if nbits > 5 or nbits + 1 >= len(live):
            return None  # no pass-count win (or > 32 ids)
        dead = 0  # id for never-accepted codes and EOS: standard mode
        # reserves it (no bits set, loses every pattern-bit-1 plane);
        # seam mode aliases it to class id 0 and relies on the veto
        # every accept set must be exactly ONE equivalence class: all
        # accepted codes at (p, j) share a column (then margin
        # exactness holds per char) — true for exact matchers
        cid_acc = np.where(acc, clsid[None, None, :], -1)
        acc_any = acc.any(axis=2)  # [P, Lmax]
        pid = cid_acc.max(axis=2)  # the accept class id per (p, j)
        mixed = acc & (cid_acc != pid[:, :, None]) & (cid_acc >= 0)
        if mixed.any():
            return None
        if (clsid[live] < 0).any():
            return None
        # +/-1 bit-plane weights and the npos thresholds
        bits = ((pid[:, :, None] >> np.arange(nbits)[None, None, :])
                & 1)  # [P, Lmax, nbits]
        wbit = np.where(acc_any[:, :, None], 2.0 * bits - 1.0,
                        0.0).transpose(1, 2, 0)  # [Lmax, nbits, P]
        npos = (bits * acc_any[:, :, None]).sum(axis=(1, 2))  # [P]
        if npos.size and (npos.max() > 127
                          or (not seam_ok and npos.min() < 1)):
            return None  # bias lane is int8; and in standard mode an
            # all-zero-id pattern can't outrank the dead id (seam mode
            # has no dead id: npos = 0 margins are still exact)
        from .pallas.scan_kernel import BITCLS, kernel_weights

        bitcls = tuple(BITCLS + b for b in range(nbits))
        W, thr, classes = kernel_weights(
            t, 0, False, bitw=(wbit, bitcls, npos))
        # exact rescore weights in class-id space (injective by
        # construction: distinct ids <=> distinct accept columns)
        alpha_r = 1 << nbits
        wconv = np.zeros((Lmax, alpha_r, P), np.float32)
        for c in live:
            np.maximum(wconv[:, clsid[c], :],
                       acc[:, :, c].T.astype(np.float32),
                       out=wconv[:, clsid[c], :])
        lut = np.full(256, dead, np.uint8)
        lut[:alpha] = np.where(clsid >= 0, clsid, dead).astype(np.uint8)
        self._route(
            "exact class-ENCODE bit-plane filter (%d live classes -> "
            "%d ids -> %d bit planes, exact margins%s)"
            % (len(live), ncls, nbits,
               ", seam veto" if seam_ok else ""))
        return {
            "W": jnp.asarray(W), "thr": jnp.asarray(thr),
            "classes": classes,
            "wconv": jnp.asarray(wconv),
            "lut": jnp.asarray(lut),
            "alpha_r": alpha_r, "eos_r": int(dead),
            "seam": bool(seam_ok),
        }

    _seam_disabled = False
    _seam_checked = False

    def _seam_probe(self, codes):
        """Before the bit mode is first bound: disable the seam (2-bit,
        no-dead-id) encode when the text carries more than a trace of
        never-accepted codes (e.g. masked N runs) — every dead position
        aliases class id 0 in both the filter and the in-pipeline
        rescore, so dense dead content floods the candidate caps with
        host-vetoed hits.  Trace amounts (entry separators) are free.
        Correctness never depends on this gate: the veto re-verifies
        every emitted hit against the ORIGINAL codes."""
        if self._seam_checked or self._bitplane_cc is not False:
            return
        self._seam_checked = True
        t = self.tables
        acc_any = np.asarray(t.match).any(axis=(0, 1))  # [alpha]
        dead = np.flatnonzero(~acc_any)
        if dead.size:
            arr = np.asarray(codes[: 1 << 22])
            frac = float(np.isin(arr, dead.astype(arr.dtype)).mean())
            if frac > 1e-3:
                self._seam_disabled = True

    def _pallas_dispatch(self, codes_dev, cap_mb: int, hit_cap: int,
                         interpret: bool):
        """Launch the fused scan (no sync) — one device call.

        The jitted callable is PRE-BOUND per (caps, interpret): re-passing
        the eight static kwargs through the jit cache costs ~0.14 ms per
        call on this backend — 17% of the whole sustained per-block
        budget — so they are closed over once.  The five table arrays stay
        ORDINARY ARGUMENTS: closing over concrete arrays bakes them into
        the lowered module as MLIR constants, which fetches each one
        device->host at lowering time (~4 s over the tunneled link on a
        cold CLI run) and keys the compile cache on table *values*."""
        bm = self._bitplane_mode()
        if bm is not None:
            codes_dev = _bit_form(codes_dev, bm["lut"])
        fn = self._dispatch_cache.get((cap_mb, hit_cap, interpret))
        if fn is None:
            fn = self._bind_dispatch(cap_mb, hit_cap, interpret)
        return fn(codes_dev, self._t3_for(codes_dev, self._scan_T()))

    _pallas_T_cached = None

    def _pallas_T(self) -> int:
        if self._pallas_T_cached is None:
            W = self._pallas_weights()[0]
            # the phase-transposed kernel's VMEM footprint is tiny, so big
            # tiles win (fewer grid steps); 64K measured at the plateau
            self._pallas_T_cached = 65536 if W.shape[1] // 128 == 1 else 16384
        return self._pallas_T_cached

    _pallas_T_bitc = None

    def _pallas_T_bit(self) -> int:
        """Tile size for the bit-plane filter's (narrower) weights —
        kept separate from :meth:`_pallas_T` so the gated pipeline and
        other class-weight consumers never see a bit-mode tile size."""
        if self._pallas_T_bitc is None:
            W = self._bitplane_mode()["W"]
            self._pallas_T_bitc = 65536 if W.shape[1] // 128 == 1 else 16384
        return self._pallas_T_bitc

    def _scan_T(self) -> int:
        """Tile size for the plain-scan dispatch path (bit-aware)."""
        return (self._pallas_T_bit() if self._bitplane_mode() is not None
                else self._pallas_T())

    def _pallas_weights(self):
        from .pallas.scan_kernel import kernel_weights

        if self._pallas_wt is None:
            W, thr, classes = kernel_weights(
                self.tables, self.k, self.poison_eos)
            self._pallas_wt = (jnp.asarray(W), jnp.asarray(thr), classes)
        return self._pallas_wt

    _pallas_wt_nofold = None

    def _pallas_weights_exact(self):
        """UNFOLDED kernel weights (margins exact, not just a superset
        filter) — the in-kernel "pos" hit extraction's weight form."""
        from .pallas.scan_kernel import kernel_weights

        if self._pallas_wt_nofold is None:
            W, thr, classes = kernel_weights(
                self.tables, self.k, self.poison_eos, fold=False)
            self._pallas_wt_nofold = (
                jnp.asarray(W), jnp.asarray(thr), classes)
        return self._pallas_wt_nofold

    def _bind_dispatch(self, cap_mb: int, hit_cap: int, interpret: bool):
        t = self.tables
        bm = self._bitplane_mode()
        if bm is not None:
            # bit-plane mode: recoded text (see _pallas_dispatch), bit
            # weights, mask-/id-indexed exact-rescore weights; alpha_r =
            # 16 mask values (IUPAC) or 2^nbits class ids (exact
            # encode), EOS -> a value accepted by nothing
            W, thr, classes = bm["W"], bm["thr"], bm["classes"]
            alpha_r, eos_r, weights = (
                bm["alpha_r"], bm["eos_r"], bm["wconv"])
        else:
            W, thr, classes = self._pallas_weights()
            alpha_r, eos_r, weights = t.alpha, t.eos_code, self.weights
        T = self._scan_T()
        thresholds, lengths = self.thresholds, self.lengths_dev
        jfn = _shared_scan_jit(
            classes, alpha_r, t.Lmax, eos_r, T, self._MB,
            cap_mb, hit_cap, interpret)
        KPAD = W.shape[1]
        from .pallas.scan_kernel import _na

        na = _na(t.Lmax)

        def fn(codes_dev, t3):
            feed = ohp = None
            # im2col feed default OFF here: on the EXACT kernel its
            # 16 B/base DMA outweighs the in-kernel build it replaces
            # (measured 1.01 vs 0.91 ms/16 MB on-chip) — the win is k>0
            # slots (higher compute/byte + it frees VMEM for T=64K
            # tiles).  The lighter ONE-HOT PLANES feed (nc bytes/base)
            # drops only the widen+compare passes and keeps the copies.
            if self._IMCOL_FEED_EXACT and \
                    codes_dev.shape[0] * KPAD // 8 <= self._IMCOL_MAX * 16:
                feed = _imcol_form(codes_dev, T, classes, na, KPAD)
            elif self._OHP_FEED_EXACT and \
                    codes_dev.shape[0] <= self._IMCOL_MAX * 4:
                ohp = _ohp_form(codes_dev, T, classes)
            return jfn(codes_dev, t3, W, thr, weights, thresholds,
                       lengths, feed, ohp)

        self._dispatch_cache[(cap_mb, hit_cap, interpret)] = fn
        return fn

    # -- fused gated pipeline (pigeonhole k>0 engines) -----------------------

    def gated_available(self, n: int) -> bool:
        """The fused seed-scan + extension-gate pipeline runs when the
        Mosaic kernel would (device scan) — the k>0 engines use it to keep
        the dense seed hits AND the almost-always-failing extensions on
        device, fetching only gate survivors.  Under a multi-device mesh
        the slots form runs data-parallel per shard
        (parallel.shard.sharded_gated_slots); configs the slots pipeline
        can't take fall back to the (sharded) plain scan.  Huge pattern
        sets (> _PBLOCK) take the pattern-blocked plain pipeline."""
        # order matters for one-shot latency: ``use_pallas`` LAST — its
        # first read initializes the jax backend (~1 s on the tunneled
        # chip), which a host-served one-shot run must never pay
        return bool(self.tables.P <= self._PBLOCK
                    and n <= self._RESIDENT_MAX
                    and (self.pallas_interpret or n >= (1 << 20))
                    and not self._host_eligible(n)
                    and self.use_pallas)

    def scan_gated(self, codes: np.ndarray, gate, indels: bool, k: int):
        """One gated scan: returns (anchors [C] int64, sids [C] int32,
        multi_starts [M] int64) where (anchor, sid) are gate-surviving
        seed candidates (sid 0-based, anchor = seed end position) and
        multi_starts are window start positions where MORE THAN ONE seed
        hit — the caller rescans those exactly and must ignore survivor
        entries at those starts (the device gated only the top seed
        there)."""
        gt = gate.t if hasattr(gate, "t") else gate
        from .pallas.scan_kernel import slots_gated_ok

        if self.mesh is not None and self.mesh.devices.size > 1:
            if slots_gated_ok(self.tables, gt, self.k):
                from ..parallel.shard import sharded_gated_slots

                return sharded_gated_slots(
                    self, gt, indels, k, np.asarray(codes), self.mesh,
                    interpret=self._mesh_interpret())
            raise NotImplementedError(
                "gated scan under a mesh needs the slots pipeline")
        codes_dev = _device_form(codes)
        if slots_gated_ok(self.tables, gt, self.k):
            return self._scan_gated_slots(codes_dev, len(codes), gt,
                                          indels, k)
        self._route(
            "gated pos-words pipeline (P=%d, Lmax=%d, k=%d): slots "
            "ineligible" % (self.tables.P, self.tables.Lmax, self.k))
        # NO _expected_hits presizing here: the pigeonhole estimate is off
        # by ~10x for mixed-length seed sets (it assumes every seed is
        # Lmin long), and oversized caps cost a giant rescore im2col every
        # scan; the first dispatch reports true counts and the sticky
        # retry converges in one step
        while True:
            caps = (self._gcap_mb, self._ghit_cap, self._gmulti_cap,
                    self._gsurv_cap)
            res = self._gated_dispatch(codes_dev, gate, indels, k, caps)
            packed = np.asarray(jax.device_get(res))
            mb_count, hit_count, multi_count, surv_count = (
                int(packed[0]), int(packed[1]), int(packed[2]),
                int(packed[3]))
            if (mb_count <= caps[0] and hit_count <= caps[1]
                    and multi_count <= caps[2] and surv_count <= caps[3]):
                break
            # sticky at CLASS level: engines rebuild scanners per run and
            # re-converging caps from the defaults would re-dispatch (and
            # on a cold cache re-compile) the undersized config every time
            cls = type(self)
            cls._gcap_mb = max(self._gcap_mb,
                               1 << (max(mb_count, 1) - 1).bit_length())
            cls._ghit_cap = max(self._ghit_cap,
                                1 << (max(hit_count, 1) - 1).bit_length())
            cls._gmulti_cap = max(
                self._gmulti_cap,
                1 << (max(multi_count, 1) - 1).bit_length())
            cls._gsurv_cap = max(
                self._gsurv_cap,
                1 << (max(surv_count, 1) - 1).bit_length())
        surv_cap = caps[3]
        anchors = packed[4 : 4 + surv_count].astype(np.int64)
        sids = packed[4 + surv_cap : 4 + surv_cap + surv_count].astype(
            np.int32)
        multi = packed[
            4 + 2 * surv_cap : 4 + 2 * surv_cap + multi_count
        ].astype(np.int64)
        return anchors, sids, multi

    _gcap_mb = 1 << 14
    _ghit_cap = 1 << 15
    _gmulti_cap = 256
    _gsurv_cap = 1 << 12

    # -- all-Pallas slots pipeline (scan + extraction + gate in-kernel) ------

    # out: the FINAL fetched row cap (post chain-gate; fetch bytes scale
    # with it, so small); work: the internal candidate gather cap
    _gslots_out = 1 << 9
    _gslots_oflow = 64
    _gslots_work = 1 << 11
    # compaction-network geometry (see pallas_scan_gated_slots): short
    # segments cut the shift-network stage count (the gated pipeline's
    # dominant VPU cost); capg slots per segment absorb local clusters,
    # denser ones escape via the per-segment overflow list.  Env
    # overrides are the measurement harness's A/B knob.
    _SLOTS_SEGL = int(os.environ.get("SAT_SLOTS_SEGL", "1024"))
    _SLOTS_CAPG = int(os.environ.get("SAT_SLOTS_CAPG", "64"))
    # PERF-DEBUG ONLY ("scan" | "nocompact" | "nogate"): truncate the
    # gated kernel after the named stage (outputs become empty) so the
    # measurement harness can attribute time; never set in production
    _SLOTS_ABLATE = os.environ.get("SAT_SLOTS_ABLATE", "")
    # 2:1 half-fold LEVELS ahead of the compaction network (see
    # scan_kernel._slots_kernel fold): factor-F fold runs the network on
    # 1/F-width planes; fold-group collisions escape to the exact host
    # rescan of all F group positions
    _SLOTS_FOLD = int(os.environ.get("SAT_SLOTS_FOLD", "2"))
    # chain-escape rows device-gated per scan: nested primer sets put
    # most multi-seed candidates on the chain path (~1.3k/scan on the
    # bench set), so the escape compaction must cover them
    _CHAIN_ECAP = int(os.environ.get("SAT_CHAIN_ECAP", "2048"))
    # precomputed im2col HBM feed (scan_kernel.imcol_transpose): skips
    # the in-kernel one-hot/im2col build — 16 bytes/base of HBM, so
    # bounded to databases where that is cheap relative to 16 GB
    _IMCOL_FEED = os.environ.get("SAT_IMCOL_FEED", "1") == "1"
    _IMCOL_FEED_EXACT = os.environ.get("SAT_IMCOL_FEED_EXACT", "0") == "1"
    _OHP_FEED_EXACT = os.environ.get("SAT_OHP_FEED_EXACT", "0") == "1"
    _IMCOL_MAX = 1 << 26
    _SLOTS_T = int(os.environ.get("SAT_SLOTS_T", "65536"))
    _gtbl_cache = None
    _chain_dev_c = None

    def _chain_dev(self, gt):
        """Device chain-member tables for the in-jit multi-seed gate of
        pallas_scan_gated_slots: (mtab [KS, CKR, CM], slen [S], gt.bits,
        gt.glen, gt.gdir) plus the static gate length, or None when the
        chain table is inapplicable (wildcard seeds)."""
        if self._chain_dev_c is not None and self._chain_dev_c[0] is gt:
            return self._chain_dev_c[1]
        tab = self._chain_table()
        if tab is None:
            self._chain_dev_c = (gt, None)
            return None
        keymap, groups, _w, _winv = tab
        CKR = self._CHAIN_MAX - 1
        CM = max((len(g) for g in groups), default=1)
        KS = keymap.shape[0]
        mtab = np.full((KS, CKR, CM), -1, np.int32)
        for sm in range(KS):
            for c in range(2, self._CHAIN_MAX + 1):
                g = keymap[sm, c]
                if g >= 0:
                    mem = groups[g]
                    mtab[sm, c - 2, : len(mem)] = mem
        # prefix-truncated member gate (like the in-kernel LgT clamp): a
        # full ≤k-edit extension implies its prefix aligns within k, so
        # clamping glen keeps the filter a superset at ~40% of the DP
        CL = min(gt.Lg, 6)
        glen_t = jnp.minimum(gt.glen, CL)
        chain = (jnp.asarray(mtab), self.lengths_dev,
                 gt.bits[:, :CL], glen_t, gt.gdir)
        self._chain_dev_c = (gt, (chain, CL))
        return self._chain_dev_c[1]

    def _slots_w(self):
        """(w, winv) chain-weight permutation for the slots meta sums
        (identity when the chain table is inapplicable)."""
        tab = self._chain_table()
        if tab is None:
            ident = np.arange(self.tables.P, dtype=np.int64)
            return ident, ident
        return tab[2], tab[3]

    def _slots_statics(self, gt):
        """Per-gate static config + device gate table, cached."""
        import math

        from .pallas.scan_kernel import SLOT_WB, slots_gate_table

        if self._gtbl_cache is not None and self._gtbl_cache[0] is gt:
            return self._gtbl_cache[1]
        t = self.tables
        # LgT clamp 6 (was 8): the gate evaluates a PREFIX of each
        # extension — any clamp is a superset filter — and 6 keeps the
        # whole window in NW = 2 packed planes (see SLOT_WB); the few
        # extra escapes ride the overlapped host extend
        LgT = max(1, min(6, int(np.max(gt.glen_np, initial=1))))
        maxlen = int(t.lengths.max(initial=1))
        # 2-bit window packing when text codes beyond 3 can only be EOS
        # and the gate never accepts them (pure relaxation otherwise)
        from .pallas.scan_kernel import slot_cpp
        # 2-bit window packing when text codes beyond 3 can only alias
        # harmlessly (EOS -> 'A': a pure gate relaxation, since extension
        # patterns never accept codes > 3 when the accept bitmasks fit 16
        # bits).  Pack/unpack uses CHAINED small shifts — single shift
        # amounts >= ~16 miscompile on this Mosaic target.
        wbits = 2 if (t.alpha <= 5 and int(gt.bits_np.max(initial=0)) < 16
                      ) else 4
        # the 2-bit regime reads the PRECOMPUTED packed-window form
        # (scan_kernel.wpack_transpose, cached per resident DB): each
        # window plane is ONE shear read in-kernel instead of 15 code
        # shears + a pack chain, and the EOS escape is one bit test
        use_wpack = wbits == 2
        from .pallas.scan_kernel import WPACK_CPP

        cpp = WPACK_CPP if use_wpack else slot_cpp(wbits)
        NW = math.ceil((SLOT_WB + maxlen + LgT + gt.band) / cpp)
        lens = tuple(sorted(set(int(x) for x in t.lengths)))
        w, _winv = self._slots_w()
        gtbl = jnp.asarray(slots_gate_table(gt, t.lengths, LgT, w)[None])
        # weight-folded selection matrix Sw[r, m] = w[m // 8] at
        # r == m % 8 (zero elsewhere): the kernel's pattern reduce
        # contracts ONE hit plane against both S and Sw — see
        # scan_kernel._pattern_matmul_reduce
        wcol_np = np.zeros((8, 8 * 128), np.int8)
        for p in range(t.P):
            for r in range(8):
                wcol_np[r, p * 8 + r] = np.int8(w[p])
        wcol = jnp.asarray(wcol_np)
        cfg = (LgT, NW, lens, gtbl, wbits, use_wpack, wcol)
        self._gtbl_cache = (gt, cfg)
        return cfg

    _slots_fold_c = None

    def _slots_dispatch(self, codes_dev, n: int, gt, indels: bool, k: int,
                        caps):
        """Launch the all-Pallas gated pipeline (no sync).  Uses the
        FOLDED weights (one fewer one-hot plane) with EOS-window escapes
        when that stays exact (scan_kernel.slots_fold_ok)."""
        self._route(
            "all-Pallas gated slots pipeline (P=%d, Lmax=%d, k=%d)"
            % (self.tables.P, self.tables.Lmax, k))
        from .pallas.scan_kernel import (pallas_scan_gated_slots,
                                         slots_fold_ok)

        t = self.tables
        if self._slots_fold_c is None:
            self._slots_fold_c = slots_fold_ok(t, self.k, self.poison_eos)
        if self._slots_fold_c:
            W, thr, classes = self._pallas_weights()
            eos_esc = t.eos_code
            if len(classes) >= len(self._pallas_weights_exact()[2]):
                eos_esc = -1  # no fold actually happened
                W, thr, classes = self._pallas_weights_exact()
            T = self._pallas_T()
        else:
            W, thr, classes = self._pallas_weights_exact()
            eos_esc = -1
            T = self._pallas_T_exact()
        # the slots kernel's VMEM stack peaks at scores [8*plive, U] int32
        # plus the matmul-reduce operand planes: with the in-kernel
        # im2col build, T = 64K overflows the 16 MB scoped-vmem limit
        # even at plive = 40 (measured 18.07 M) and T = 48K is the
        # plateau.  The HBM im2col feed frees the build scratches, and
        # T = 64K then fits UP TO plive = 48 (scores 12.6 M + 2 x 1 M
        # feed blocks) and measures ~9% faster (fewer per-tile fixed
        # costs + epilogue rows), parity-checked on-chip.
        use_feed = (self._IMCOL_FEED
                    and codes_dev.shape[0] <= self._IMCOL_MAX)
        if use_feed and t.P <= 48:
            T = min(T, self._SLOTS_T)
        else:
            T = min(T, 49152 if t.P <= 64 else 32768)
        LgT, NW, lens, gtbl, wbits, use_wpack, wcol = \
            self._slots_statics(gt)
        U = T // 8
        fold = self._SLOTS_FOLD
        Ueff = U // fold
        segl = min(self._SLOTS_SEGL, Ueff)
        capg = self._SLOTS_CAPG
        # cap = capg * nsegs must stay a LANE multiple: the post-gate
        # re-compaction's lane rotates on a non-128-multiple plane
        # lower to multi-op shuffles (~0.8 ms/scan measured at cap=192)
        while (capg * (Ueff // segl)) % 128:
            capg += 1
        if capg > segl:
            # _seg_compact's static slice [g*segl : g*segl + capg] would
            # span into the next segment — a silent slot corruption, so
            # reject the (env-overridden) geometry loudly
            raise ValueError(
                "slots geometry: capg %d > segl %d (SAT_SLOTS_SEGL/"
                "SAT_SLOTS_CAPG)" % (capg, segl))
        self._slots_geom = (T, segl, Ueff // segl, fold)
        t3 = self._t3_for(codes_dev, T)
        wpk = (_wpk_form(codes_dev, T, t.eos_code) if use_wpack else None)
        feed = None
        if use_feed:
            from .pallas.scan_kernel import _na

            feed = _imcol_form(codes_dev, T, classes, _na(t.Lmax), 128)
        cdev = self._chain_dev(gt)
        chain, chain_Lg = cdev if cdev is not None else (None, 0)
        return pallas_scan_gated_slots(
            codes_dev, W, thr, gtbl, t3, wpk, chain, wcol, feed,
            classes=classes,
            Lmax=t.Lmax, T=T, NW=NW, cap=capg * (Ueff // segl), LgT=LgT,
            kk=k, band=gt.band, indels=indels, lens=lens, out_cap=caps[0],
            oflow_cap=caps[1], work_cap=caps[2], chain_Lg=chain_Lg,
            interpret=self.pallas_interpret,
            n_pat=t.P, eos_esc=eos_esc, wbits=wbits, segl=segl,
            ablate=self._SLOTS_ABLATE, fold=fold,
            chain_ecap=self._CHAIN_ECAP)

    _chain_tab_c = False  # False = unbuilt, None = inapplicable (wc seeds)
    _CHAIN_MAX = 8

    def _chain_table(self):
        """Static multi-seed resolution table.  Two exact seeds matching
        at the SAME window start both equal the text there, so one is a
        prefix of the other: the matcher set at any position is the
        prefix closure of its longest matcher — a chain, determined
        statically.  The kernels' matmul pattern reduce emits the SUM of
        the hitting seeds' WEIGHTS (a permutation of 0..P-1 shipped as
        the kernel's per-row weight column), so the observable key is
        (weight_sum, count).  A plain id sum collides easily (any two
        same-size chains with equal id totals); the permutation is
        searched statically until every multi-member chain keys uniquely
        — singles are always unique (w is a bijection).  Residual
        ambiguous keys (search failed) stay None and fall back to the
        exact host rescan.  Returns (keymap, groups, w, winv); None when
        inapplicable (wc wildcard accept sets can co-match without a
        prefix relation)."""
        if self._chain_tab_c is not False:
            return self._chain_tab_c
        t = self.tables
        P = t.P
        ok = all(
            (t.pat_codes[p, : t.lengths[p]] >= 0).all() for p in range(P))
        if not ok:
            self._chain_tab_c = None
            return None
        seqs = [tuple(int(c) for c in t.pat_codes[p, : t.lengths[p]])
                for p in range(P)]
        mems = []
        for L in range(P):
            mems.append(tuple(sorted(
                s for s in range(P)
                if len(seqs[s]) <= len(seqs[L])
                and seqs[s] == seqs[L][: len(seqs[s])])))
        multi = sorted({m for m in mems if len(m) >= 2})
        rng = np.random.default_rng(12345)
        w = np.arange(P, dtype=np.int64)
        for _attempt in range(300):
            keys = set()
            ok = True
            for mem in multi:
                key = (int(sum(w[s] for s in mem)), len(mem))
                if key in keys:
                    ok = False
                    break
                keys.add(key)
            if ok:
                break
            w = rng.permutation(P).astype(np.int64)
        chains: dict = {}
        for mem in mems:
            key = (int(sum(w[s] for s in mem)), len(mem))
            if chains.get(key, mem) != mem:
                chains[key] = None  # ambiguous (weight search failed)
            else:
                chains[key] = mem
        CM = self._CHAIN_MAX
        maxsum = max((k[0] for k in chains), default=0)
        keymap = np.full((maxsum + 1, CM + 1), -1, np.int32)
        groups: list[np.ndarray] = []
        for (sm, c), mem in chains.items():
            if mem is None or c > CM:
                continue
            keymap[sm, c] = len(groups)
            groups.append(np.asarray(mem, np.int64))
        winv = np.zeros(P, np.int64)
        winv[w] = np.arange(P)
        self._chain_tab_c = (keymap, groups, w.astype(np.int64), winv)
        return self._chain_tab_c

    def _expand_chains(self, pos, sm, cnt):
        """Resolve multi-seed escape entries statically from their
        (id-sum, count) keys: returns (exp_pos, exp_sid,
        unresolved_mask).  The slots meta clamps the sum at 1023, but
        the clamp only binds at cnt >= 9 (max id 127), which is past
        _CHAIN_MAX and lands on the unresolved path regardless."""
        tab = self._chain_table()
        if tab is None or not len(pos):
            return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.ones(len(pos), bool))
        keymap, groups, _w, _winv = tab
        oob = (cnt > self._CHAIN_MAX) | (sm >= keymap.shape[0])
        c = np.where(oob, 0, cnt)
        gid = keymap[np.minimum(sm, keymap.shape[0] - 1), c]
        gid[oob] = -1
        unresolved = gid < 0
        pos_l, sid_l = [], []
        for g in np.unique(gid[gid >= 0]):
            mem = groups[g]
            pg = pos[gid == g]
            pos_l.append(np.repeat(pg, len(mem)))
            sid_l.append(np.tile(mem, len(pg)))
        if pos_l:
            return (np.concatenate(pos_l), np.concatenate(sid_l),
                    unresolved)
        return np.zeros(0, np.int64), np.zeros(0, np.int64), unresolved

    def _slots_decode(self, packed, n: int, out_cap: int, oflow_cap: int,
                      geom=None):
        """(anchors, sids, multi) from a fetched slots packed row (caller
        has already checked the caps).  Multi-seed escapes resolve
        through the static chain table where unambiguous (the expanded
        candidates join the survivor arrays; the host extension validates
        them exactly); the rest land on the rescan list.

        ``geom`` pins the (T, segl, nsegs, fold) the row was DISPATCHED
        with — the sharded pipeline passes its own (T clamped to 32768,
        parallel.shard._sgs_statics) because ``self._slots_geom`` tracks
        the latest single-chip dispatch and the two can interleave on
        one scanner."""
        t = self.tables
        T, segl, nsegs, fold = (geom if geom is not None
                                else self._slots_geom)
        total, oflow = int(packed[0]), int(packed[1])
        pos = packed[2 : 2 + total].astype(np.int64)
        meta = packed[2 + out_cap : 2 + out_cap + total]
        esc = meta < 0
        sums = ((meta >> 5) & 1023).astype(np.int64)
        # non-escape slots always have cnt == 1, where the weight sum IS
        # the seed's weight code: invert through the chain permutation
        _w, winv = self._slots_w()
        sid1 = winv[np.minimum(sums, len(winv) - 1)]
        surv_anchor = pos[~esc] + t.lengths[sid1[~esc]].astype(np.int64)
        surv_sid = sid1[~esc]
        cnts = (meta & 31).astype(np.int64)
        # tail windows (possible zero-pad overread) always rescan; other
        # escapes are cnt>1 multi-seed positions: expand via the chain.
        # cnt marker 30 = a fold-group lane collision (several lanes of
        # one fold group hit): rescan ALL ``fold`` window starts of the
        # group exactly (scan_kernel fold levels).
        tail = esc & (pos > n - t.Lmax)
        pairesc = (esc & ~tail & (cnts == 30)) if fold > 1 \
            else np.zeros_like(esc)
        mul = esc & ~tail & ~pairesc & (cnts < 31)
        epos, esid, unres = self._expand_chains(
            pos[mul], sums[mul], cnts[mul])
        multi = [pos[tail], pos[esc & ~tail & ~pairesc & (cnts >= 31)],
                 pos[mul][unres]]
        if fold > 1:
            UF = (T // 8) // fold
            pe = pos[pairesc]
            tile, lp = pe // T, pe % T
            r, lane = lp & 7, lp >> 3
            base = lane % UF
            for j in range(fold):
                pj = tile * T + 8 * (base + j * UF) + r
                multi.append(pj[pj < n])
        if len(epos):
            surv_anchor = np.concatenate(
                [surv_anchor, epos + t.lengths[esid]])
            surv_sid = np.concatenate([surv_sid, esid])
        # slot-cap overflow escapes are SEGMENT-granular: id = (tile*8 +
        # r) * nsegs + g covers positions 8*(g*segl + j) + r of tile
        # (scan_kernel.pallas_scan_gated_slots segraw layout) — every
        # start in that span rescans exactly
        rows = packed[2 + 2 * out_cap : 2 + 2 * out_cap + oflow]
        for r0 in rows:
            row, g = int(r0) // nsegs, int(r0) % nsegs
            tile, r = row >> 3, row & 7
            lanes = g * segl + np.arange(segl, dtype=np.int64)
            UF = (T // 8) // fold
            for j in range(fold):  # folded segments cover every level
                starts = tile * T + 8 * (lanes + j * UF) + r
                multi.append(starts[starts < n])
        multi = np.concatenate(multi)
        return surv_anchor, surv_sid.astype(np.int32), multi

    def _scan_gated_slots(self, codes_dev, n: int, gt, indels: bool,
                          k: int):
        """scan_gated through :func:`pallas_scan_gated_slots`: the seed
        scan, hit extraction AND extension gate all run in Mosaic kernels;
        the host fetches one small packed row.  Output contract identical
        to the pos-words path (anchors/sids/multi), with slot-cap
        overflow rows folded into the exact-rescan escape list."""
        cls = type(self)
        while True:
            caps = (self._gslots_out, self._gslots_oflow,
                    self._gslots_work)
            res = self._slots_dispatch(codes_dev, n, gt, indels, k, caps)
            packed = np.asarray(jax.device_get(res))
            total, oflow = int(packed[0]), int(packed[1])
            wtotal = int(packed[-1])
            if total <= caps[0] and oflow <= caps[1] \
                    and wtotal <= caps[2]:
                break
            cls._gslots_out = max(
                caps[0], 1 << (max(total, 1) - 1).bit_length())
            cls._gslots_oflow = max(
                caps[1], 1 << (max(oflow, 1) - 1).bit_length())
            cls._gslots_work = max(
                caps[2], 1 << (max(wtotal, 1) - 1).bit_length())
        return self._slots_decode(packed, n, caps[0], caps[1])

    def scan_gated_stream(self, blocks, gate, indels: bool, k: int,
                          depth: int = 96):
        """Pipelined gated scans over an iterator of flat code arrays —
        the scan_stream transport discipline for the all-Pallas gated
        pipeline: block i+1's device pipeline dispatches before block i's
        results return, and the (small) packed rows are fetched in
        stacked groups on a background thread, amortizing the tunnel
        round-trip.  Yields (i, anchors, sids, multi) per block, in
        order; blocks ineligible for the slots pipeline fall back to the
        synchronous :meth:`scan_gated`."""
        from collections import deque

        from .pallas.scan_kernel import slots_gated_ok

        gt = gate.t if hasattr(gate, "t") else gate
        pool = self._fetch_pool()
        pending = deque()  # (i, n, dev, res, caps)
        fut = None
        fgroup = None  # [(i, n, dev, caps)]

        def launch(take):
            group = [pending.popleft()]
            while pending and len(group) < take \
                    and pending[0][4] == group[0][4]:
                group.append(pending.popleft())
            rs = [g[3] for g in group]
            stacked = self._stack(rs) if len(rs) > 1 else rs[0]
            f = pool.submit(lambda r=stacked: np.asarray(jax.device_get(r)))
            return f, [(g[0], g[1], g[2], g[4]) for g in group]

        def drain(f, group):
            rows = f.result()
            if rows.ndim == 1:
                rows = rows[None]
            for (i, n, dev, caps), row in zip(group, rows):
                total, oflow = int(row[0]), int(row[1])
                if total > caps[0] or oflow > caps[1] \
                        or int(row[-1]) > caps[2]:
                    # overflow: redo solo (grows the sticky class caps)
                    yield (i,) + self._scan_gated_slots(
                        dev, n, gt, indels, k)
                else:
                    yield (i,) + self._slots_decode(
                        row, n, caps[0], caps[1])

        for i, codes in enumerate(blocks):
            dev = _device_form(codes)
            n = len(codes)
            if not (self.gated_available(n)
                    and slots_gated_ok(self.tables, gt, self.k)):
                # flush in-flight work to preserve output order
                while fut is not None or pending:
                    if fut is not None:
                        yield from drain(fut, fgroup)
                        fut = fgroup = None
                    if pending:
                        fut, fgroup = launch(len(pending))
                yield (i,) + self.scan_gated(codes, gate, indels, k)
                continue
            caps = (self._gslots_out, self._gslots_oflow,
                    self._gslots_work)
            res = self._slots_dispatch(dev, n, gt, indels, k, caps)
            pending.append((i, n, dev, res, caps))
            if len(pending) >= depth:
                if fut is not None:
                    yield from drain(fut, fgroup)
                fut, fgroup = launch(max(depth // 2, 1))
        while fut is not None or pending:
            if fut is not None:
                yield from drain(fut, fgroup)
                fut = fgroup = None
            if pending:
                fut, fgroup = launch(len(pending))

    def rescan_starts_arrays(self, codes: np.ndarray, starts):
        """Exact host rescan of window start positions against the full
        accept table (the gated pipeline's multi-seed escape), vectorized
        over the whole start array: returns (starts [M] int64,
        pids_0based [M] int64) for every pattern hitting there, in
        (start, pid) order."""
        t = self.tables
        n = len(codes)
        starts = np.sort(np.asarray(starts, dtype=np.int64))
        if not len(starts):
            return (np.zeros(0, np.int64),) * 2
        # windows via a clipped gather — NO full-array pad copy (the old
        # np.concatenate([codes, pad]) duplicated the whole database per
        # rescan call: ~1.5 ms of the k=1 serving tail for ONE escape);
        # positions past the end fill with the device rescore's pad code
        # (eos, or code 0 when the table has no EOS class)
        fill = max(t.eos_code, 0)
        idx = starts[:, None] + np.arange(t.Lmax)
        wins = np.ascontiguousarray(
            codes[np.minimum(idx, n - 1)])  # [M, Lmax]
        wins[idx >= n] = fill
        # scores[m, p] = sum_j match[p, j, wins[m, j]]
        m3 = t.match.transpose(1, 2, 0)  # [Lmax, alpha, P]
        sc = np.zeros((len(starts), t.P), dtype=np.int32)
        for j in range(t.Lmax):
            sc += m3[j, wins[:, j], :]
        mi, pi = np.nonzero(sc >= (t.lengths - self.k)[None, :])
        return starts[mi], pi.astype(np.int64)

    def rescan_starts(self, codes: np.ndarray, starts):
        """Generator form of :meth:`rescan_starts_arrays`."""
        st, pi = self.rescan_starts_arrays(codes, np.asarray(list(starts)))
        for i in range(len(st)):
            yield int(st[i]), int(pi[i])

    _pallas_T_exact_c = None

    def _pallas_T_exact(self) -> int:
        if self._pallas_T_exact_c is None:
            W = self._pallas_weights_exact()[0]
            self._pallas_T_exact_c = (
                65536 if W.shape[1] // 128 == 1 else 16384)
        return self._pallas_T_exact_c

    def _gated_dispatch(self, codes_dev, gate, indels: bool, k: int, caps):
        from .pallas.scan_kernel import pos_exact_ok

        t = self.tables
        exact_pos = pos_exact_ok(t, self.k)
        if exact_pos:
            # in-kernel extraction wants the UNFOLDED (exact-margin)
            # weights; no rescore pass exists in that mode
            W, thr, classes = self._pallas_weights_exact()
            T = self._pallas_T_exact()
        else:
            W, thr, classes = self._pallas_weights()
            T = self._pallas_T()
        gt = gate.t if hasattr(gate, "t") else gate
        jfn = _shared_gated_jit(
            classes, t.alpha, t.Lmax, t.eos_code, T, self._MB,
            caps[0], caps[1], caps[2], caps[3],
            gt.Lg, k, gt.band, indels, self.pallas_interpret, exact_pos)
        return jfn(codes_dev, self._t3_for(codes_dev, T), W, thr,
                   self.weights, self.thresholds, self.lengths_dev,
                   gt.bits, gt.glen, gt.gdir)

    def _t3_for(self, codes_dev, T: int):
        return _t3_form(codes_dev, T)

    def _pallas_decode(self, res, codes_dev, n: int, interpret: bool,
                       caps=None):
        """Sync one dispatched result (a single packed int32 array — one
        transport round-trip), retrying with larger caps on overflow, and
        yield (end, pid, mism) tuples."""
        packed = np.asarray(jax.device_get(res))
        yield from self._decode_packed(packed, codes_dev, n, interpret, caps)

    def _decode_packed(self, packed, codes_dev, n: int, interpret: bool,
                       caps=None):
        """Decode an already-fetched packed result row, retrying with
        larger caps on overflow (a fresh dispatch + solo fetch; rare)."""
        cap_mb, hit_cap = caps or (self._cap_mb, self._hit_cap)
        mb_count, hit_count = int(packed[0]), int(packed[1])
        if mb_count > cap_mb or hit_count > hit_cap:
            yield from self._redispatch(
                codes_dev, n, interpret, mb_count, hit_count)
            return
        mb_idx = packed[2 : 2 + cap_mb]
        hits = packed[2 + cap_mb : 2 + cap_mb + hit_cap]
        if cap_mb * self._MB * self.tables.P < (1 << 24):
            # mism rides the hit word's high byte (scan_kernel layout)
            hit_idx = hits & 0x00FFFFFF
            hit_mism = hits >> 24
        else:
            hit_idx = hits
            hit_mism = packed[2 + cap_mb + hit_cap :]
        yield from self._emit(hit_count, mb_idx, hit_idx, hit_mism, n,
                              codes_dev)

    def _redispatch(self, codes_dev, n: int, interpret: bool,
                    mb_count: int, hit_count: int):
        """Overflow retry: grow the caps past the observed true counts,
        rerun the scan, and decode solo.  Recursion through
        :meth:`_pallas_decode` covers the case where a grown ``cap_mb``
        exposes new hits past the grown ``hit_cap``; caps grow
        monotonically so it terminates."""
        cap_mb = max(self._cap_mb,
                     1 << int(max(mb_count, 1) - 1).bit_length())
        hit_cap = max(self._hit_cap,
                      1 << int(max(hit_count, 1) - 1).bit_length())
        self._cap_mb = max(self._cap_mb, cap_mb)
        self._hit_cap = max(self._hit_cap, hit_cap)
        res = self._pallas_dispatch(codes_dev, cap_mb, hit_cap, interpret)
        yield from self._pallas_decode(
            res, codes_dev, n, interpret, (cap_mb, hit_cap))

    def _emit(self, hit_count: int, mb_idx, hit_idx, hit_mism, n: int,
              codes_dev=None):
        """Yield (end, pid, mism) tuples from live result sections.
        ``mb_idx`` may be just the live prefix: hit words only reference
        slots below the true microblock count (pad windows carry the
        ``compact_mask`` fill index >= nmb and are masked in-kernel)."""
        if hit_count == 0:
            return
        t = self.tables
        lengths = t.lengths
        P = t.P
        MB = self._MB
        idx = hit_idx[:hit_count].astype(np.int64)
        ms = hit_mism[:hit_count]
        slot = idx // (MB * P)
        win = (idx // P) % MB
        pid = idx % P
        starts = mb_idx[slot].astype(np.int64) * MB + win
        keep = starts < n
        starts, pid, ms = starts[keep], pid[keep], ms[keep]
        ends = starts + lengths[pid]
        bm = self._bitplane_cc
        if (isinstance(bm, dict) and bm.get("seam") and len(starts)
                and codes_dev is not None):
            # SEAM VETO: the 2-bit encode has no dead id, so dead codes
            # (EOS separators, stray non-base chars) alias class id 0
            # through both the filter and the rescore — re-verify each
            # hit window against the ORIGINAL codes.  codes_dev is None
            # only on sharded decodes, whose dispatch never ran seam
            # weights (_bitmode_nomesh filters the seam cc out), so
            # skipping the veto there is sound.
            arr = _host_of_dev(codes_dev)
            if arr is None:  # host block GC'd before decode: fetch back
                arr = np.asarray(jax.device_get(codes_dev))
            arr = np.asarray(arr)
            acc = self._seam_acc
            if acc is None:
                acc = self._seam_acc = np.asarray(t.match)
            ok = np.ones(len(starts), bool)
            for i, (s, e, p) in enumerate(zip(starts, ends, pid)):
                if e > n:
                    ok[i] = False
                    continue
                w = arr[s:e].astype(np.int64)
                ok[i] = bool(acc[p, np.arange(e - s), w].all())
            starts, pid, ms = starts[ok], pid[ok], ms[ok]
            ends = ends[ok]
        for e, p, m in zip(ends, pid, ms):
            yield int(e), int(p), int(m)

    _seam_acc = None

    # candidate-buffer floors: true candidate counts on non-degenerate
    # corpora are tiny (tens per 16 MB block), and every downstream stage
    # (rescan gather, hit-mask compaction, result fetch) scales with the
    # caps, so small floors buy real throughput; `_expected_hits` raises
    # them up-front for dense configs and overflow retries grow them
    # stickily
    _cap_mb = 128
    _hit_cap = 512
    # optional per-block progress callback (frac in (0,1]) — the reference's
    # report_progress protocol (pattern_match.h:144-155), attached by the
    # model when the driver runs verbose
    progress = None

    def _expected_hits(self, n: int) -> float:
        """Crude expected candidate count on random text: n * P /
        alpha^(Lmin-k).  Steers the pallas/XLA choice and initial caps."""
        t = self.tables
        lmin = int(t.lengths.min()) if len(t.lengths) else 1
        eff = max(lmin - self.k, 1)
        sigma = max(t.alpha - 1, 2)  # alphabet minus the EOS code
        try:
            return float(n) * t.P / float(sigma) ** eff
        except OverflowError:
            return 0.0

    _mer_tables_c = None
    _by_len_c = None

    @staticmethod
    def _mer_lib_ok() -> bool:
        """The native mer-hash machine is loadable: past _PBLOCK the
        dense device correlation is FLOP-bound (O(n * P * K)) and the
        threaded hash probe beats it outright, so huge-P exact scans
        prefer the census even when a device path exists."""
        from ..native import load_shift_and_lib

        lib = load_shift_and_lib()
        return lib is not None and hasattr(lib, "sat_mer_scan")

    def _mer_native(self, by_len: dict, codes: np.ndarray, n: int,
                    sort: bool = True, gate=None):
        """(ends, pids0) arrays via the native threaded mer-hash scan
        (``native/shift_and.cpp::sat_mer_scan``), or None when the
        library is unavailable.  Open-addressing tables (4x load factor
        headroom, duplicate codes chained) build once per scanner."""
        import ctypes

        from ..native import load_shift_and_lib

        lib = load_shift_and_lib()
        if lib is None or not hasattr(lib, "sat_mer_scan"):
            return None
        t = self.tables
        if self._mer_tables_c is None:
            tabs = {}
            for L, entries in by_len.items():
                P_L = len(entries)
                tsize = 1 << max(int(np.ceil(np.log2(4 * P_L + 1))), 4)
                keys = np.full(tsize, ~np.uint64(0), np.uint64)
                head = np.full(tsize, -1, np.int32)
                enext = np.full(P_L, -1, np.int32)
                epid = np.zeros(P_L, np.int32)
                GOLD = 0x9E3779B97F4A7C15
                U64 = (1 << 64) - 1
                mask = tsize - 1
                # bloom prefilter sized to the pattern count (a fixed
                # 2^19-bit filter saturates to ~17% false positives at
                # P = 100k half-seeds): ~2^5 bits per key caps the FP
                # rate at ~3% while staying cache-resident
                bloom_bits = min(max(19, P_L.bit_length() + 5), 26)
                bloom = np.zeros(1 << (bloom_bits - 6), np.uint64)
                GOLD2 = 0xC2B2AE3D27D4EB4F
                bshift = 64 - bloom_bits
                for e, (c, pi) in enumerate(entries):
                    epid[e] = pi
                    b = ((c * GOLD2) & U64) >> bshift
                    bloom[b >> 6] |= np.uint64(1 << (b & 63))
                    slot = (((c * GOLD) & U64) >> 32) & mask
                    while keys[slot] != ~np.uint64(0) \
                            and keys[slot] != np.uint64(c):
                        slot = (slot + 1) & mask
                    if keys[slot] == ~np.uint64(0):
                        keys[slot] = np.uint64(c)
                        head[slot] = e
                    else:  # duplicate code: push onto the chain
                        enext[e] = head[slot]
                        head[slot] = e
                # direct-address sidecar for base-4 (DNA) seed classes
                # with 2L <= 22 index bits: head4[code4] kills the
                # bloom + key-compare + open-addressing walk (one load
                # per position, <= 16 MB L3-resident table —
                # shift_and.cpp::mer_scan_range_d4)
                head4 = enext4 = bit4 = None
                if 2 * L <= 22 and P_L:
                    pids_L = np.fromiter((pi for _, pi in entries),
                                         np.int64, P_L)
                    dig = np.asarray(t.pat_codes, np.int64)[pids_L, :L]
                    if (dig >= 0).all() and (dig < 4).all():
                        code4 = np.zeros(P_L, np.int64)
                        for j in range(L):
                            code4 = (code4 << 2) | dig[:, j]
                        head4 = np.full(1 << (2 * L), -1, np.int32)
                        enext4 = np.full(P_L, -1, np.int32)
                        for e, c4 in enumerate(code4.tolist()):
                            enext4[e] = head4[c4]
                            head4[c4] = e
                        # exact presence bitmap (4^L bits, L2-resident):
                        # the sweep tests this instead of touching the
                        # (up to 16 MB) head table per position
                        packed = np.packbits(head4 >= 0,
                                             bitorder="little")
                        if len(packed) % 8:
                            packed = np.concatenate(
                                [packed, np.zeros(8 - len(packed) % 8,
                                                  np.uint8)])
                        bit4 = np.ascontiguousarray(
                            packed).view(np.uint64)
                tabs[L] = (keys, head, enext, epid, tsize, bloom,
                           bloom_bits, head4, enext4, bit4)
            self._mer_tables_c = tabs
        tabs = self._mer_tables_c
        codes8 = np.ascontiguousarray(np.asarray(codes, np.uint8))
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_u64p = ctypes.POINTER(ctypes.c_uint64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_i8p = ctypes.POINTER(ctypes.c_int8)
        # optional inline prefix extension gate (mer_gate_pass): a
        # per-pattern (dir, prefix codes, len, G, k, band) superset
        # filter evaluated on the scan threads — candidates it rejects
        # could not survive the exact extension
        if gate is not None:
            gdir, gpref, gglen, gG, gk, gband = gate
            if os.environ.get("SAT_MER_ABLATE") == "gate":
                # bench-insurance breakage proof (bench.py): force the
                # inline gate to over-prune (k=0 tolerance) so a broken
                # mer_gate_pass demonstrably trips the row validators
                gk = 0
            # pack the per-pattern gate metadata into ONE uint64/pattern
            # when it fits (G <= 6, i.e. k <= 2): the three-array form
            # costs ~3 random cache lines per gated candidate and
            # measured ~2/3 of the whole inline-gate cost at xmers
            # phase-2 rates (see shift_and.cpp::mer_gate_pass_packed)
            gpack = None
            if gG <= 6:
                cached = self._mer_gpack_c
                if cached is not None and cached[0] is gdir:
                    gpack = cached[1]
                else:
                    d64 = np.where(gdir > 0, 1,
                                   np.where(gdir < 0, 2, 0)).astype(
                                       np.uint64)
                    g64 = d64 | (gglen.astype(np.uint64) << np.uint64(2))
                    pref = gpref.reshape(-1, gG).astype(np.uint64)
                    for j in range(gG):
                        g64 |= pref[:, j] << np.uint64(16 + 8 * j)
                    gpack = np.ascontiguousarray(g64)
                    self._mer_gpack_c = (gdir, gpack)
            gate_args = (gdir.ctypes.data_as(c_i8p),
                         gpref.ctypes.data_as(c_u8p),
                         gglen.ctypes.data_as(c_u8p), gG, gk, gband,
                         gpack.ctypes.data_as(c_u64p)
                         if gpack is not None else None)
        else:
            gate_args = (None, None, None, 0, 0, 0, None)
        d4fn = getattr(lib, "sat_mer_scan_d4", None)
        all_s, all_p = [], []
        for L, (keys, head, enext, epid, tsize, bloom,
                bloom_bits, head4, enext4, bit4) in tabs.items():
            if n < L:
                continue
            # direct-address walk when the class has a base-4 table and
            # the gate (if any) rides the packed record
            use_d4 = (d4fn is not None and head4 is not None
                      and (gate is None or gate_args[6] is not None))
            if use_d4:
                pack, bad = self._mer_pack(codes8, n)
            cap = max(4 * len(epid) + (n >> 6), 1 << 14)
            while True:
                # reused across scans: a fresh 4P-row np.empty pair
                # costs ~1-2 ms of page faults per call at xmers scale
                buf = self._mer_outbuf_c
                if buf is None or len(buf[0]) < cap:
                    buf = (np.empty(cap, np.int64), np.empty(cap, np.int32))
                    self._mer_outbuf_c = buf
                out_s, out_p = buf
                if use_d4:
                    total = d4fn(
                        codes8.ctypes.data_as(c_u8p),
                        pack.ctypes.data_as(c_u8p),
                        bad.ctypes.data_as(c_i64p), len(bad), n, L,
                        head4.ctypes.data_as(c_i32p),
                        enext4.ctypes.data_as(c_i32p),
                        epid.ctypes.data_as(c_i32p),
                        bit4.ctypes.data_as(c_u64p),
                        gate_args[4], gate_args[5], gate_args[6], 0,
                        out_s.ctypes.data_as(c_i64p),
                        out_p.ctypes.data_as(c_i32p), cap)
                else:
                    total = lib.sat_mer_scan(
                        codes8.ctypes.data_as(c_u8p), n, L, t.alpha,
                        keys.ctypes.data_as(c_u64p),
                        head.ctypes.data_as(c_i32p),
                        enext.ctypes.data_as(c_i32p),
                        epid.ctypes.data_as(c_i32p), tsize,
                        bloom.ctypes.data_as(c_u64p), bloom_bits,
                        *gate_args, 0,
                        out_s.ctypes.data_as(c_i64p),
                        out_p.ctypes.data_as(c_i32p), cap)
                if total < 0:
                    return None
                if total <= cap:
                    break
                cap = 1 << (int(total) - 1).bit_length()
            # COPY out of the reused buffer: the next length class's
            # native call would overwrite these views
            all_s.append(out_s[: int(total)].copy())
            all_p.append(out_p[: int(total)].astype(np.int64))

        if not all_s:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        starts = all_s[0] if len(all_s) == 1 else np.concatenate(all_s)
        pids = all_p[0] if len(all_p) == 1 else np.concatenate(all_p)
        if os.environ.get("SAT_MER_ABLATE") == "scan":
            # bench-insurance breakage proof: drop every odd-start hit
            # from the NATIVE census output only — a broken sat_mer_scan
            # must make the bench row validators fire
            sel = (starts & 1) == 0
            starts, pids = starts[sel], pids[sel]
        if sort:
            order = np.lexsort((pids, starts))
            starts, pids = starts[order], pids[order]
        ends = starts + t.lengths[pids].astype(np.int64)
        return ends, pids

    _radix_ok_c = None
    _mer_outbuf_c = None
    _mer_gpack_c = None
    _mer_pack_cc = None

    def _mer_pack(self, codes8, n):
        """(pack, bad) for the direct-address census walk: the 2-bit
        MSB-first packed text (+pad bytes so the kernel's 8-byte loads
        never run off the end) and the sorted positions of chars with
        code >= 4 (EOS/ambiguity — base-4 masking would alias them).
        Static per database, cached by buffer identity: the resident-DB
        serving path re-scans the same array every run."""
        # identity by OBJECT (held strongly), not by buffer address: a
        # fresh array can legally reuse a freed buffer's address, and a
        # stale (pack, bad) against new codes is silently wrong output.
        # The resident serving path passes the same uint8 array object
        # every run (ascontiguousarray is a no-op there), so the cache
        # still hits where it matters.
        cached = self._mer_pack_cc
        if cached is not None and cached[0] is codes8 and cached[1] == n:
            return cached[2], cached[3]
        m = (n + 3) // 4
        padded = np.zeros(4 * m, np.uint8)
        padded[:n] = codes8[:n]
        q = (padded & 3).reshape(m, 4)
        pack = np.concatenate([
            (q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3],
            np.zeros(16, np.uint8)])
        pack = np.ascontiguousarray(pack)
        bad = np.flatnonzero(codes8[:n] >= 4).astype(np.int64)
        self._mer_pack_cc = (codes8, n, pack, bad)
        return pack, bad

    def scan_seed_arrays(self, codes: np.ndarray, sort: bool = True,
                         gate=None):
        """(ends, pids0) int64 arrays when an array-native host census
        serves this scan (the same routing test as :meth:`scan`'s radix
        branch); None otherwise — callers fall back to iterating
        :meth:`scan`.  Skips the per-hit tuple stream entirely: at
        xmers scale (100k seeds, ~10^5 hits) the generator hops cost
        more than the census itself."""
        n = len(codes)
        # NOTE: no _sharded_capable() bail (round 5, VERDICT r4 item 4a):
        # the census is HOST-side work — dense exact seeds degenerate the
        # device two-level filter with or without a mesh, so a
        # slots-ineligible pigeonhole engine under a multi-chip mesh
        # routes its seed scan here exactly like the single-chip model
        # (output identical at any device count; the device mesh still
        # serves the engine's other phases)
        if self._stream_whole(codes) or self._host_eligible(n):
            return None
        est = self._expected_hits(n)
        nmb = max(n // self._MB, 1)
        dev_ok = self.use_pallas and (
            self.pallas_interpret or n >= (1 << 20))
        if not (self.k == 0 and n >= (1 << 18)
                and (est * 4 >= nmb
                     or (self.tables.P > self._PBLOCK
                         and (not dev_ok or self._mer_lib_ok())))
                and self._radix_eligible()):
            return None
        return self._scan_radix_arrays(self._by_len(), codes, n, sort=sort,
                                       gate=gate)

    def _radix_eligible(self) -> bool:
        """Radix lookup needs literal (wildcard-free) patterns and codes
        that fit an int64 base-alpha register.  Cached: the per-pattern
        sweep costs ~0.15 s at P = 50k and tables never change."""
        if self._radix_ok_c is not None:
            return self._radix_ok_c
        t = self.tables
        ok = t.Lmax * np.log2(max(t.alpha, 2)) < 62
        if ok:
            cols = np.arange(t.pat_codes.shape[1])[None, :]
            live = cols < t.lengths[:, None]
            ok = not bool((np.asarray(t.pat_codes) < 0)[live].any())
        self._radix_ok_c = ok
        return ok

    def _scan_radix(self, codes: np.ndarray):
        """Exact multi-pattern scan as a host radix-code census: rolling
        base-alpha window codes per distinct pattern length, matched by
        binary search against the sorted pattern codes.  The hash_table
        engine's direct-indexed lookup (hash_table.cc:144-226) as a
        whole-array vector pass.  When the native threaded mer-hash
        machine is available it takes over (one rolling probe per
        position instead of L numpy passes — the huge-P regime where a
        dense MXU correlation is FLOP-bound at O(n * P * K))."""
        ends, pids = self._scan_radix_arrays(self._by_len(), codes,
                                             len(codes))
        e_l = ends.tolist()
        p_l = pids.tolist()
        yield from zip(e_l, p_l, [0] * len(e_l))

    def _by_len(self):
        """{length: [(code, pid0)]} — vectorized per-length base-alpha
        code build, cached per scanner (the per-pattern python loop
        costs ~0.35 s at P = 50k PER SCAN)."""
        if self._by_len_c is None:
            t = self.tables
            alpha = t.alpha
            by_len: dict[int, list] = {}
            lens = t.lengths.astype(np.int64)
            pc = np.asarray(t.pat_codes, np.int64)
            for L in np.unique(lens):
                L = int(L)
                sel = np.flatnonzero(lens == L)
                codes_L = np.zeros(len(sel), np.int64)
                for j in range(L):
                    codes_L = codes_L * alpha + pc[sel, j]
                by_len[L] = list(zip(codes_L.tolist(), sel.tolist()))
            self._by_len_c = by_len
        return self._by_len_c

    def _scan_radix_arrays(self, by_len, codes, n, sort=True, gate=None):
        """(ends, pids0) int64 arrays in (window-start, pattern) order —
        the array core of :meth:`_scan_radix`.  ``sort=False`` skips the
        final (start, pattern) lexsort for callers that re-order anyway
        (the pigeonhole emit tails) — ~20 ms per 200k hits."""
        t = self.tables
        alpha = t.alpha
        native = self._mer_native(by_len, codes, n, sort=sort, gate=gate)
        if native is not None:
            self._route("native threaded mer-hash census "
                        "(%d patterns)" % t.P)
            return native
        self._route("host radix-code census (numpy)")
        # int32 rolling codes when they fit (alpha^Lmax < 2^31) — halves the
        # memory traffic of the dominant update loop; in-place ops avoid
        # reallocating the 4n-byte id array per pattern position
        small = max(by_len) * np.log2(max(alpha, 2)) < 31 if by_len else True
        dt = np.int32 if small else np.int64
        cN = codes.astype(dt)
        all_starts = []
        all_pids = []
        for L, entries in by_len.items():
            if n < L:
                continue
            ids = cN[: n - L + 1].copy()
            for j in range(1, L):
                ids *= dt(alpha)
                ids += cN[j : j + n - L + 1]
            ids = ids.astype(np.int64, copy=False)
            entries.sort()
            scodes = np.fromiter((c for c, _ in entries), np.int64,
                                 len(entries))
            uniq, first = np.unique(scodes, return_index=True)
            pos = np.searchsorted(uniq, ids)
            pos = np.minimum(pos, len(uniq) - 1)
            starts = np.nonzero(uniq[pos] == ids)[0]
            ci = pos[starts]
            # one emission per matching pattern; duplicate pattern codes
            # (identical patterns) fan out
            counts = np.diff(np.append(first, len(scodes)))
            order = np.argsort(uniq)  # identity; uniq sorted
            del order
            for rep in range(int(counts.max(initial=1))):
                sel = counts[ci] > rep
                if not sel.any():
                    break
                idx = first[ci[sel]] + rep
                all_starts.append(starts[sel])
                all_pids.append(
                    np.fromiter((entries[i][1] for i in idx), np.int64,
                                len(idx)))
        if not all_starts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        starts = np.concatenate(all_starts)
        pids = np.concatenate(all_pids)
        order = np.lexsort((pids, starts))
        starts, pids = starts[order], pids[order]
        ends = starts + t.lengths[pids].astype(np.int64)
        return ends, pids

    # -- pattern-blocked outer loop (P > _PBLOCK) ----------------------------

    # one fused-pipeline pass handles at most this many patterns: the
    # kernel's per-text-tile output planes and the rescore's
    # [candidates, P] score tensor both scale with P, so huge sets
    # (xmers -b 50000 phase-1 batches, xmers.cc:821; nrdb's one seed per
    # database sequence, nrdb.cc:196-220) run as ceil(P / _PBLOCK)
    # passes over the SAME resident text (codes upload and phase
    # transpose are cached by array identity — each extra pass costs
    # only its own weights and kernel time)
    _PBLOCK = 2048
    _pblock_subs_c = None

    def _pblock_subs(self):
        """Sub-scanners over <= _PBLOCK-pattern table slices, built once
        per scanner (their converged candidate caps persist across
        scans)."""
        if self._pblock_subs_c is None:
            from .tables import PatternTables

            t = self.tables
            subs = []
            for off in range(0, t.P, self._PBLOCK):
                sl = slice(off, min(off + self._PBLOCK, t.P))
                st = PatternTables(
                    match=t.match[sl], lengths=t.lengths[sl],
                    pat_codes=t.pat_codes[sl], Lmax=t.Lmax,
                    alpha=t.alpha, eos_code=t.eos_code,
                    code_chars=t.code_chars,
                )
                sub = ConvScanner(st, k=self.k, poison_eos=self.poison_eos,
                                  block=self.block, use_pallas=True)
                sub.pallas_interpret = self.pallas_interpret
                sub.use_host = False
                subs.append((off, sub))
            self._pblock_subs_c = subs
        return self._pblock_subs_c

    def _scan_pblocked(self, codes: np.ndarray, interpret: bool = False):
        """Pattern-blocked fused scan: ALL passes dispatch before any
        result is fetched (the device queues them back to back; the
        transport round-trips overlap the later passes' compute), then
        hits merge to the global (window-start, pattern) order."""
        codes_dev = _device_form(codes)
        n = len(codes)
        pending = []
        for off, sub in self._pblock_subs():
            sub._seam_probe(codes)
            est = int(sub._expected_hits(n) * 4) + 1
            if est > sub._hit_cap:
                sub._hit_cap = 1 << (est - 1).bit_length()
            if est > sub._cap_mb:
                nmb = max(n // sub._MB, 1)
                sub._cap_mb = 1 << (min(est, nmb) - 1).bit_length()
            caps = (sub._cap_mb, sub._hit_cap)
            res = sub._pallas_dispatch(codes_dev, caps[0], caps[1],
                                       interpret)
            pending.append((off, sub, res, caps))
        # fetch packed rows in shape-grouped STACKS: one round trip per
        # group instead of per pass (the transport charges ~34 ms RTT per
        # fetch; 25 passes serialized cost more than the scans)
        rows: dict = {}
        i = 0
        while i < len(pending):
            j = i + 1
            shape = pending[i][2].shape
            while j < len(pending) and pending[j][2].shape == shape:
                j += 1
            group = pending[i:j]
            if len(group) == 1:
                rows[i] = np.asarray(jax.device_get(group[0][2]))
            else:
                stacked = np.asarray(jax.device_get(
                    self._stack([g[2] for g in group])))
                for gi in range(len(group)):
                    rows[i + gi] = stacked[gi]
            i = j
        out = []
        for idx, (off, sub, _res, caps) in enumerate(pending):
            lens = sub.tables.lengths
            for end, p0, m in sub._decode_packed(
                    rows[idx], codes_dev, n, interpret, caps):
                out.append((end - int(lens[p0]), off + p0, end, m))
        out.sort()
        for _start, pid, end, m in out:
            yield end, pid, m

    def _scan_pallas(self, codes: np.ndarray, interpret: bool = False):
        """Fused single-round-trip scan: the Mosaic MXU microblock filter,
        candidate compaction, window rescore and hit extraction all run in one
        device call (:func:`..pallas.scan_kernel.pallas_scan_hits`)."""
        self._seam_probe(codes)
        codes_dev = _device_form(codes)
        # pre-size the candidate buffers from the expected density so the
        # overflow-retry (a fresh Mosaic compile) stays rare
        est = int(self._expected_hits(len(codes)) * 4) + 1
        if est > self._hit_cap:
            self._hit_cap = 1 << (est - 1).bit_length()
        if est > self._cap_mb:
            nmb = max(len(codes) // self._MB, 1)
            self._cap_mb = 1 << (min(est, nmb) - 1).bit_length()
        caps = (self._cap_mb, self._hit_cap)
        res = self._pallas_dispatch(codes_dev, caps[0], caps[1], interpret)
        yield from self._pallas_decode(
            res, codes_dev, len(codes), interpret, caps)

    _stack_jit = None

    @classmethod
    def _stack(cls, rs):
        """On-device stack of same-shape packed results (one dispatch)."""
        if cls._stack_jit is None:
            cls._stack_jit = jax.jit(lambda *a: jnp.stack(a))
        return cls._stack_jit(*rs)

    _gcap = 1024  # group-fetch entry capacity (grows on group overflow)
    _fetch_exec = None

    def _fetch_pool(self):
        if self._fetch_exec is None:
            from concurrent.futures import ThreadPoolExecutor

            self._fetch_exec = ThreadPoolExecutor(max_workers=1)
        return self._fetch_exec

    def _launch_group(self, pending, count: int):
        """Pop the leading same-caps run (packed rows must share a
        layout; caps can grow after an overflow retry) and start its
        fetch in the background.  Returns an in-flight handle for
        :meth:`_drain_group`."""
        group = [pending.popleft()]
        while len(group) < count and pending and \
                pending[0][4] == group[0][4]:
            group.append(pending.popleft())
        caps = group[0][4]
        pool = self._fetch_pool()
        if len(group) == 1:
            fut = pool.submit(
                lambda r=group[0][1]: np.asarray(jax.device_get(r)))
            return ("solo", group, None, fut, 0, caps)
        # pad the stack to a power-of-two bucket by repeating the last row
        # (bounds the (#args, shape) jit specializations; pad entries land
        # AFTER every real row's segment, so they only ever truncate
        # themselves on gcap overflow)
        bucket = 1 << (len(group) - 1).bit_length()
        rs = [x[1] for x in group]
        rs += [rs[-1]] * (bucket - len(rs))
        stacked = self._stack(rs)
        long_form = caps[0] * self._MB * self.tables.P >= (1 << 24)
        gcap = self._gcap
        res = _pack_group(stacked, cap_mb=caps[0], hit_cap=caps[1],
                          gcap=gcap, long_form=long_form)
        fut = pool.submit(lambda r=res: np.asarray(jax.device_get(r)))
        return ("group", group, stacked, fut, gcap, caps)

    def _drain_group(self, inflight, interpret: bool):
        """Wait for an in-flight group fetch and yield its
        (block_index, hits_list) results in order."""
        kind, group, stacked, fut, gcap, caps = inflight
        cap_mb, hit_cap = caps
        packed = fut.result()
        if kind == "solo":
            j, r, d, n, c, _h = group[0]
            yield j, list(self._decode_packed(packed, d, n, interpret, c))
            return
        g = len(group)
        bucket = int(stacked.shape[0])
        mbc_t = packed[:g]
        hc_t = packed[bucket : bucket + g]
        mbc = np.minimum(mbc_t, cap_mb)
        hc = np.minimum(hc_t, hit_cap)
        # the pad rows' (duplicated last row) entries sit after all real
        # segments, so real segments are intact iff the REAL totals fit
        if int(mbc.sum()) > gcap or int(hc.sum()) > gcap:
            # group overflow: fall back to the full stacked fetch and
            # grow the entry capacity for subsequent groups
            need = max(int(mbc.sum()), int(hc.sum()))
            self._gcap = max(self._gcap, 1 << (need - 1).bit_length())
            rows = np.asarray(jax.device_get(stacked))
            for (j, r, d, n, c, _h), row in zip(group, rows):
                yield j, list(self._decode_packed(row, d, n, interpret, c))
            return
        base = 2 * bucket
        mb_entries = packed[base : base + gcap]
        hit_entries = packed[base + gcap : base + 2 * gcap]
        long_form = cap_mb * self._MB * self.tables.P >= (1 << 24)
        mism_entries = packed[base + 2 * gcap :] if long_form else None
        mb_off = np.zeros(g + 1, np.int64)
        mb_off[1:] = np.cumsum(mbc, dtype=np.int64)
        hit_off = np.zeros(g + 1, np.int64)
        hit_off[1:] = np.cumsum(hc, dtype=np.int64)
        for gi, (j, r, d, n, c, _h) in enumerate(group):
            if mbc_t[gi] > cap_mb or hc_t[gi] > hit_cap:
                yield j, list(self._redispatch(
                    d, n, interpret, int(mbc_t[gi]), int(hc_t[gi])))
                continue
            mb = mb_entries[mb_off[gi] : mb_off[gi + 1]]
            hv = hit_entries[hit_off[gi] : hit_off[gi + 1]]
            if long_form:
                hi, hm = hv, mism_entries[hit_off[gi] : hit_off[gi + 1]]
            else:
                hi, hm = hv & 0x00FFFFFF, hv >> 24
            yield j, list(self._emit(int(hc_t[gi]), mb, hi, hm, n, d))

    _STREAM_DEPTH = int(os.environ.get("SAT_STREAM_DEPTH", "256"))

    def scan_stream(self, blocks, depth: int | None = None):
        """Pipelined scan over an iterator of flat code arrays.

        Three-level latency hiding for the tunneled transport (fetch
        cost is ~34 ms + bytes/14 MB/s regardless of payload; device
        compute for a whole 16 MB block is ~30 us — the transport, not
        the chip, is the resource to schedule):

        - block i+1 is dispatched before block i's results are collected
          (device compute overlaps the host round-trip),
        - results are synced in GROUPS: when ``depth`` blocks are in
          flight, the oldest ``depth // 2`` are compacted ON DEVICE to
          their live entries (:func:`_pack_group` — true counts are tiny,
          so this turns a ~1.3 MB padded fetch into a few KB) and fetched
          with ONE ``device_get``, and
        - the fetch itself runs on a background thread, so the round-trip
          overlaps the dispatch of the NEXT ``depth // 2`` blocks instead
          of stalling the stream.

        Packed results are ~20 KB each, so a deep window costs ~5 MB of
        device memory on top of the in-flight input blocks (those
        dominate: depth x block bytes).

        Yields (block_index, hits_list) in order."""
        from collections import deque

        if depth is None:
            depth = self._STREAM_DEPTH
        if self._sharded_capable():
            from ..parallel.shard import sharded_scan_stream

            self._route(
                "sharded pipelined scan STREAM over %d devices "
                "(dispatch/fetch overlapped)" % self.mesh.devices.size)
            yield from sharded_scan_stream(
                self, blocks, self.mesh,
                interpret=self._mesh_interpret(), depth=depth)
            return
        if not self.use_pallas or self.tables.P > self._PBLOCK:
            # huge pattern sets stream block-by-block through the
            # pattern-blocked scan (each block is itself pipelined
            # across its ceil(P/_PBLOCK) passes)
            for i, codes in enumerate(blocks):
                yield i, list(self.scan(codes))
            return
        pending = deque()
        interpret = self.pallas_interpret
        inflight = None
        for i, codes in enumerate(blocks):
            # reuse the device copy when the same host array repeats
            self._seam_probe(codes)
            dev = _device_form(codes)
            caps = (self._cap_mb, self._hit_cap)
            res = self._pallas_dispatch(dev, caps[0], caps[1], interpret)
            # the 6th element pins the HOST block until its decode ONLY
            # when the seam veto will read it (it re-verifies hits
            # against the original codes; an ephemeral streamed block
            # would otherwise be GC'd and force a device fetch-back) —
            # unconditionally it would hold depth x blocksize bytes of
            # peak RSS for nothing on the default depth-256 stream
            bm = self._bitplane_cc
            pin = codes if isinstance(bm, dict) and bm.get("seam") \
                else None
            pending.append((i, res, dev, len(codes), caps, pin))
            if len(pending) >= depth:
                if inflight is not None:
                    yield from self._drain_group(inflight, interpret)
                inflight = self._launch_group(pending, max(depth // 2, 1))
        while inflight is not None or pending:
            if inflight is not None:
                yield from self._drain_group(inflight, interpret)
                inflight = None
            if pending:
                inflight = self._launch_group(pending, len(pending))

    _host_scanner = None
    # tri-state: None = auto (small scans), False = never (pin a device
    # path), True = whenever the native machine can represent the patterns
    use_host = None

    def _host_eligible(self, n: int) -> bool:
        """Route to the native shift-and machine when the scan is small
        enough that fixed device costs (trace/lower, table upload, the
        tunnel round-trip) dominate; never when a test explicitly asked
        for the interpret-mode kernel."""
        import os

        if self.use_host is False or self.pallas_interpret:
            return False
        if self.use_host is None and (self.k > 4 or n > (1 << 26)):
            return False
        if os.environ.get("SAT_HOST_SCAN", "1") == "0":
            return False
        if self._host_scanner is None:
            from .host_scan import HostShiftAnd

            self._host_scanner = HostShiftAnd(
                self.tables, self.k, self.poison_eos)
        return self._host_scanner.available()

    # streaming memory model (DB >> RAM / HBM): whole-array scans over a
    # np.memmap (or any array past the device-residency bound) run as
    # halo'd blocks through the pipelined scan_stream — bounded host AND
    # device memory, the reference's mmap streaming model (mapFile.h:6-55)
    _STREAM_BLOCK = 1 << 24   # positions per streamed block
    _RESIDENT_MAX = 1 << 28   # largest array kept device-resident whole

    def _stream_whole(self, codes) -> bool:
        n = len(codes)
        if n > self._RESIDENT_MAX:
            return True
        return isinstance(codes, np.memmap) and n > self._STREAM_BLOCK

    def _scan_flat_stream(self, codes):
        """Whole-array scan in streamed halo'd blocks: a window is owned
        by the block containing its start, so concatenating the rebased
        per-block streams IS the global (window-start, pattern) order.
        Each block is materialized (paging in only its window of the
        memmap), scanned via scan_stream's pipelined dispatch, and
        released; in-flight device blocks are bounded by ``depth``."""
        t = self.tables
        halo = t.Lmax - 1 + self.k
        B = self._STREAM_BLOCK
        n = len(codes)
        lengths = t.lengths
        # release consumed pages of a memory-mapped source as we go:
        # without this the kernel keeps every touched page resident and
        # RSS grows to the file size (breaking cgroup/container limits
        # long before actual memory pressure would)
        mm = getattr(codes, "_mmap", None) \
            if getattr(codes, "offset", 1) == 0 else None

        def blocks():
            import mmap as _mmap

            drop = mm if hasattr(_mmap, "MADV_DONTNEED") else None
            pg = _mmap.PAGESIZE
            for s in range(0, n, B):
                yield np.ascontiguousarray(codes[s : s + B + halo])
                if drop is not None:
                    try:
                        lo = s // pg * pg
                        drop.madvise(_mmap.MADV_DONTNEED, lo,
                                     min(s + B + halo, n) - lo)
                    except (ValueError, OSError):
                        drop = None

        nblocks = -(-n // B)
        if self._sharded_capable():
            # DB >> RAM *and* a mesh: every streamed block is itself
            # position-sharded over the chips (the multi-host north
            # star's memory model — the DB is big BECAUSE there are
            # many chips); ownership/rebase rules are identical
            from ..parallel.shard import sharded_scan_stream

            stream = sharded_scan_stream(
                self, blocks(), self.mesh, depth=4,
                interpret=self._mesh_interpret())
        else:
            stream = self.scan_stream(blocks(), depth=4)
        for i, hits in stream:
            base = i * B
            for end, pid, m in hits:
                if end - int(lengths[pid]) < B:  # halo-started: next block's
                    yield end + base, pid, m
            if self.progress:
                self.progress((i + 1) / nblocks)

    def scan(self, codes: np.ndarray):
        """Iterate candidate tuples over the whole array (host generator)."""
        if self._stream_whole(codes):
            self._route(
                "streamed block scan (DB >> RAM)"
                + (", sharded over %d devices" % self.mesh.devices.size
                   if self._sharded_capable() else ""))
            yield from self._scan_flat_stream(codes)
            return
        if self._sharded_capable():
            # explicit multi-chip intent wins over the single-host
            # latency heuristics: every chip scans its position shard
            # through the fused pipeline, hit rows ride one all_gather
            from ..parallel.shard import sharded_pallas_scan_hits

            self._route("fused Mosaic pipeline sharded over %d devices"
                        % self.mesh.devices.size)
            yield from sharded_pallas_scan_hits(
                self, codes, self.mesh, interpret=self._mesh_interpret())
            if self.progress:
                self.progress(1.0)
            return
        est = self._expected_hits(len(codes))
        nmb = max(len(codes) // self._MB, 1)
        # the shift-and machine beats the radix census whenever its state
        # fits (measured 15x on the dense 80-seed halves scan: the census
        # pays L passes over the whole code array per distinct length plus
        # a searchsorted, the bit machine one table step per char), so it
        # goes first; radix remains the huge-pattern-set dense-seed path
        # (hash/xmers seeds overflow the 4096-bit shift-and state)
        if self._host_eligible(len(codes)):
            self._route("native shift-and host machine "
                        "(one-shot latency path)")
            yield from self._host_scanner.scan(
                codes, cap_hint=int(est * 4) + 1024)
            if self.progress:
                self.progress(1.0)
            return
        dev_ok = self.use_pallas and (
            self.pallas_interpret or len(codes) >= (1 << 20))
        if (self.k == 0 and len(codes) >= (1 << 18)
                and (est * 4 >= nmb
                     or (self.tables.P > self._PBLOCK
                         and (not dev_ok or self._mer_lib_ok())))
                and self._radix_eligible()):
            # dense exact seeds (pigeonhole halves/bases/hash engines):
            # nearly every microblock fires, which degenerates the
            # two-level device filter — a host radix-code lookup beats
            # the device paths here (no transfers, no compiles).  Huge
            # pattern sets with no device path also land here: the XLA
            # block fallback pays O(B * P) dense scores
            self._route("host radix census (dense exact seeds)")
            yield from self._scan_radix(codes)
            if self.progress:
                self.progress(1.0)
            return
        if self.use_pallas and (
            self.pallas_interpret or len(codes) >= (1 << 20)
        ):
            # small inputs aren't worth the Mosaic compile; the XLA block
            # path below is already instant there
            if self.tables.P > self._PBLOCK:
                self._route(
                    "pattern-blocked Mosaic pipeline (%d patterns, "
                    "%d blocks)" % (self.tables.P,
                                    -(-self.tables.P // self._PBLOCK)))
                yield from self._scan_pblocked(codes, self.pallas_interpret)
            else:
                self._route("fused Mosaic scan pipeline")
                yield from self._scan_pallas(codes, self.pallas_interpret)
            if self.progress:
                self.progress(1.0)
            return
        Lmax = self.tables.Lmax
        P = self.tables.P
        self._route(
            "XLA block-scan fallback (Lmax=%d%s, P=%d, k=%d, n=%d)"
            % (Lmax, " > 128: no Mosaic kernel" if Lmax > 128 else "",
               P, self.k, len(codes)))
        n = len(codes)
        eos = self.tables.eos_code
        lengths = self.tables.lengths
        # the [B, P] hit grid is flat-indexed in int32 by the compaction;
        # huge pattern sets shrink the block to keep B * P < 2^31
        block = max(min(self.block, ((1 << 31) - 1) // max(P, 1) - Lmax), 8)
        for start in range(0, n, block):
            b = min(block, n - start)
            chunk = np.full(block + Lmax - 1, eos, dtype=np.uint8)
            avail = min(n - start, block + Lmax - 1)
            chunk[:avail] = codes[start : start + avail]
            cap = self.cap
            while True:
                packed = np.asarray(_conv_scan_block(
                    jnp.asarray(chunk), self.weights, self.thresholds,
                    self.lengths_dev, self.tables.alpha, cap,
                ))
                count = int(packed[0])
                if count <= cap:
                    break
                cap *= 4  # recompile with larger capacity (rare)
            if count == 0:
                if self.progress:
                    self.progress((start + b) / n)
                continue
            idx = packed[1 : 1 + count].astype(np.int64)
            mism = packed[1 + cap : 1 + cap + count]
            win = idx // P
            pid = idx % P
            keep = win < b  # windows starting beyond the true block are halo
            win, pid, mism = win[keep], pid[keep], mism[keep]
            ends = start + win + lengths[pid]
            for e, p, m in zip(ends, pid, mism):
                yield int(e), int(p), int(m)
            if self.progress:
                self.progress((start + b) / n)
