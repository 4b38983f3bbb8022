"""Host bit-parallel scan: the latency path of the exact/k-mismatch engine.

The device pipeline (`ops/conv_scan.py`) is throughput-optimal but pays a
fixed per-process cost (kernel trace/lower, table upload, and a ~34 ms
transport round-trip per fetch on the tunneled link).  For one-shot CLI
jobs on small databases that fixed cost dominates, so — exactly like the
reference's strategy layer picks an engine per workload
(``select.cc:103-142``) — the scanner routes small scans to a native
multiword shift-and / Wu-Manber row machine (``native/shift_and.cpp``,
the reference's ``shift_and.cc:218-254`` / ``shift_and_inexact.cc``
algorithm) built from the same dense accept table as the conv weights, so
its candidate set is identical by construction.

Accept-table semantics reproduced exactly: the conv score is the number
of MATCHING ACCEPTING COLUMNS of the window (columns with no accepted
code — gapped-seed don't-cares, unmappable pattern chars — contribute
zero whatever the text), thresholded at ``lengths[p] - k``.  Here each
pattern's bit run covers the span from its first to last accepting
column; gap columns inside the span become all-ones (don't-care) bits
that advance the shift without costing a row, and the per-pattern slack
``k_p = A_p - lengths[p] + k`` (A_p = accepting-column count) is applied
at emission, with the reported mismatch count re-based by
``lengths[p] - A_p`` — matching ``mism = lengths[p] - score``.
"""

from __future__ import annotations

import numpy as np

MAX_STATE_BITS = 64 * 64  # native kMaxWords


class HostShiftAnd:
    """Candidate-set-identical host scanner over a PatternTables.

    Emits (end, pattern_index_0based, mismatches) ordered by
    (window_start, pattern) — the ConvScanner contract.
    """

    def __init__(self, tables, k: int, poison_eos: bool):
        from ..native import load_shift_and_lib

        self.lib = load_shift_and_lib()
        self.tables = tables
        self.k = k
        self.poison_eos = poison_eos
        self._built = False
        self._reason = None

    # -- representability ---------------------------------------------------

    def _analyze(self):
        """Per-pattern accepting-column geometry; None when the conv
        semantics isn't representable as a shift run."""
        t = self.tables
        P, Lmax, alpha = t.match.shape
        has = t.match.any(axis=2)  # [P, Lmax] column accepts anything
        lengths = t.lengths.astype(np.int64)
        if (lengths <= self.k).any():
            # threshold <= 0: the conv path hits at EVERY window; keep
            # that degenerate contract on the device paths
            return None
        plans = []
        nbits = 0
        for p in range(P):
            cols = np.nonzero(has[p])[0]
            A = len(cols)
            k_p = A - int(lengths[p]) + self.k
            if A == 0 or k_p < 0:
                plans.append(None)  # never hits
                continue
            col0, col1 = int(cols[0]), int(cols[-1])
            span = col1 - col0 + 1
            if self.poison_eos and (col0 != 0 or span != int(lengths[p])):
                # the poison row covers columns j < lengths[p]
                # (conv_weights), which only coincides with the span
                # barrier for dense runs
                return None
            plans.append((col0, col1, span, k_p))
            nbits += span
        if not (0 < nbits <= MAX_STATE_BITS):
            return None
        return plans, nbits

    def available(self) -> bool:
        if self.lib is None or self.tables.alpha > 256:
            return False
        if self._reason is None:
            self._reason = "ok" if self._analyze() is not None else "no"
        return self._reason == "ok"

    # -- mask build ---------------------------------------------------------

    def _build(self):
        t = self.tables
        P, Lmax, alpha = t.match.shape
        plans, nbits = self._analyze()
        nwords = (nbits + 63) // 64
        u = np.zeros((alpha, nwords), dtype=np.uint64)
        s = np.zeros(nwords, dtype=np.uint64)
        e = np.zeros(nwords, dtype=np.uint64)
        # per end bit: pattern, last accepting column, emission slack/base
        end_pid = np.full(nbits, -1, dtype=np.int64)
        end_col1 = np.zeros(nbits, dtype=np.int64)
        end_kp = np.zeros(nbits, dtype=np.int64)
        end_base = np.zeros(nbits, dtype=np.int64)
        has = t.match.any(axis=2)
        bit = 0
        for p in range(P):
            if plans[p] is None:
                continue
            col0, col1, span, k_p = plans[p]
            s[bit // 64] |= np.uint64(1) << np.uint64(bit % 64)
            for j in range(col0, col1 + 1):
                w, m = bit // 64, np.uint64(1) << np.uint64(bit % 64)
                if has[p, j]:
                    for c in np.nonzero(t.match[p, j])[0]:
                        u[c, w] |= m
                else:  # gap column: don't-care
                    u[:, w] |= m
                bit += 1
            eb = bit - 1
            e[eb // 64] |= np.uint64(1) << np.uint64(eb % 64)
            end_pid[eb] = p
            end_col1[eb] = col1
            end_kp[eb] = k_p
            end_base[eb] = self.k - k_p
        self._u, self._s, self._e = u, s, e
        self._end_pid, self._end_col1 = end_pid, end_col1
        self._end_kp, self._end_base = end_kp, end_base
        self._nwords = nwords
        self._rows = np.zeros((self.k + 1) * nwords, dtype=np.uint64)
        self._built = True

    # -- scan ---------------------------------------------------------------

    def scan(self, codes: np.ndarray, cap_hint: int = 0):
        if not self._built:
            self._build()
        import ctypes

        lib = self.lib
        t = self.tables
        codes = np.ascontiguousarray(np.asarray(codes, dtype=np.uint8))
        n = len(codes)
        cap = max(int(cap_hint), 1024)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_u64p = ctypes.POINTER(ctypes.c_uint64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        use_mt = hasattr(lib, "sat_shift_and_scan_mt") and n >= (1 << 20)
        while True:
            out_end = np.empty(cap, dtype=np.int64)
            out_bit = np.empty(cap, dtype=np.int32)
            out_mism = np.empty(cap, dtype=np.int32)
            if use_mt:
                # threaded over text chunks with a (Lmax - 1)-char
                # warm-up halo (the shift-and rows' exact state memory):
                # the one-shot CLI's dominant above-floor cost
                total = lib.sat_shift_and_scan_mt(
                    codes.ctypes.data_as(c_u8p), n,
                    self._u.ctypes.data_as(c_u64p), t.alpha, self._nwords,
                    self._s.ctypes.data_as(c_u64p),
                    self._e.ctypes.data_as(c_u64p),
                    self.k, int(self.poison_eos), t.eos_code,
                    int(t.Lmax) - 1, 0,
                    out_end.ctypes.data_as(c_i64p),
                    out_bit.ctypes.data_as(c_i32p),
                    out_mism.ctypes.data_as(c_i32p), cap,
                )
            else:
                total = lib.sat_shift_and_scan(
                    codes.ctypes.data_as(c_u8p), n,
                    self._u.ctypes.data_as(c_u64p), t.alpha, self._nwords,
                    self._s.ctypes.data_as(c_u64p),
                    self._e.ctypes.data_as(c_u64p),
                    self.k, int(self.poison_eos), t.eos_code,
                    self._rows.ctypes.data_as(c_u64p),
                    out_end.ctypes.data_as(c_i64p),
                    out_bit.ctypes.data_as(c_i32p),
                    out_mism.ctypes.data_as(c_i32p), cap,
                )
            if total < 0:
                raise RuntimeError("shift-and state exceeds native budget")
            if total <= cap:
                break
            cap = 1 << (int(total) - 1).bit_length()
        total = int(total)
        bits = out_bit[:total]
        rowmin = out_mism[:total].astype(np.int64)
        keep = rowmin <= self._end_kp[bits]
        bits, rowmin = bits[keep], rowmin[keep]
        ends_t = out_end[:total][keep]  # text pos one past the last column
        pids = self._end_pid[bits]
        starts = ends_t - 1 - self._end_col1[bits]
        keep = starts >= 0
        bits, rowmin = bits[keep], rowmin[keep]
        pids, starts = pids[keep], starts[keep]
        ends = starts + t.lengths.astype(np.int64)[pids]
        mism = rowmin + self._end_base[bits]
        order = np.lexsort((pids, starts))
        for i in order:
            yield int(ends[i]), int(pids[i]), int(mism[i])


class HostSellers:
    """Native k-EDIT (indel) candidate scanner: the one-shot latency path
    of the filter engine (``shift_and_inexact.cc:265-315`` semantics —
    the level sets of the Sellers semi-global DP as k+1 bit rows).

    Candidate-set identical to :class:`..sellers.SellersScanner` by
    construction: each pattern contributes a dense run of ``lengths[p]``
    bits whose accept sets are the conv table's columns (an
    empty-accept column simply never matches — substitution/indel
    only), so bit (p, j) of row i <=> the length-(j+1) prefix of p
    aligns to some text substring ending at the current char with <= i
    edits, and the minimal row whose END bit fires is mindist(b, p).
    """

    def __init__(self, tables, k: int):
        from ..native import load_shift_and_lib

        self.lib = load_shift_and_lib()
        self.tables = tables
        self.k = k
        self._built = False

    def available(self) -> bool:
        if self.lib is None or self.tables.alpha > 256:
            return False
        t = self.tables
        lengths = t.lengths.astype(np.int64)
        if (lengths <= self.k).any():  # degenerate: hits everywhere
            return False
        # 24 words: the native template instantiation budget (the k-edit
        # inner loop carries 3 shifted terms per row — big states belong
        # on the device paths anyway)
        return 0 < int(lengths.sum()) <= 24 * 64 and self.k <= 8

    def _build(self):
        t = self.tables
        P = t.P
        lengths = t.lengths.astype(np.int64)
        nbits = int(lengths.sum())
        nwords = (nbits + 63) // 64
        nr = self.k + 1
        u = np.zeros((t.alpha, nwords), dtype=np.uint64)
        s = np.zeros(nwords, dtype=np.uint64)
        e = np.zeros(nwords, dtype=np.uint64)
        init = np.zeros((nr, nwords), dtype=np.uint64)
        end_pid = np.full(nbits, -1, dtype=np.int64)
        bit = 0
        for p in range(P):
            L = int(lengths[p])
            s[bit // 64] |= np.uint64(1) << np.uint64(bit % 64)
            for j in range(L):
                w, m = bit // 64, np.uint64(1) << np.uint64(bit % 64)
                for c in np.nonzero(t.match[p, j])[0]:
                    u[c, w] |= m
                # INIT_i: prefixes of length <= i deleted outright
                for i in range(j + 1, nr):
                    init[i, w] |= m
                bit += 1
            eb = bit - 1
            e[eb // 64] |= np.uint64(1) << np.uint64(eb % 64)
            end_pid[eb] = p
        self._u, self._s, self._e, self._init = u, s, e, init
        self._end_pid = end_pid
        self._nwords = nwords
        self._built = True

    def pairs(self, codes: np.ndarray, cap_hint: int = 0):
        """(ends, pids, mism) int64/int64/int64 arrays, UNORDERED —
        the full candidate set {(b, p): mindist(b, p) <= k}."""
        if not self._built:
            self._build()
        import ctypes

        lib = self.lib
        t = self.tables
        codes = np.ascontiguousarray(np.asarray(codes, dtype=np.uint8))
        n = len(codes)
        cap = max(int(cap_hint), 1024)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_u64p = ctypes.POINTER(ctypes.c_uint64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        while True:
            out_end = np.empty(cap, dtype=np.int64)
            out_bit = np.empty(cap, dtype=np.int32)
            out_mism = np.empty(cap, dtype=np.int32)
            total = lib.sat_sellers_scan(
                codes.ctypes.data_as(c_u8p), n,
                self._u.ctypes.data_as(c_u64p), t.alpha, self._nwords,
                self._s.ctypes.data_as(c_u64p),
                self._e.ctypes.data_as(c_u64p),
                self._init.ctypes.data_as(c_u64p),
                self.k, t.eos_code,
                int(t.Lmax) + self.k, 0,
                out_end.ctypes.data_as(c_i64p),
                out_bit.ctypes.data_as(c_i32p),
                out_mism.ctypes.data_as(c_i32p), cap,
            )
            if total < 0:
                raise RuntimeError("sellers state exceeds native budget")
            if total <= cap:
                break
            cap = 1 << (int(total) - 1).bit_length()
        total = int(total)
        ends = out_end[:total]
        pids = self._end_pid[out_bit[:total]]
        return ends, pids, out_mism[:total].astype(np.int64)
