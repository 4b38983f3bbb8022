"""Fused gated k>0 pipeline (seed scan + extension gate on device) vs the
host engine path — output must be IDENTICAL: the gate is a superset filter
(ops/gate.py docstring proof) and the exact native extension decides, so the
engines' hit streams cannot differ.  Interpret mode on CPU; the compiled
kernel is exercised on hardware by bench.py."""

import numpy as np
import pytest

from sequence_alignment_tools_tpu.io.database import SeqDB
from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
from sequence_alignment_tools_tpu.models.primer_match import PrimerMatchModel


def _mutate(rng, pat: str, nmut: int, indels: bool) -> str:
    s = list(pat)
    for _ in range(nmut):
        op = rng.integers(0, 3) if indels else 0
        i = int(rng.integers(0, len(s)))
        if op == 0:
            s[i] = "ACGT"[int(rng.integers(0, 4))]
        elif op == 1 and len(s) > 4:
            del s[i]
        else:
            s.insert(i, "ACGT"[int(rng.integers(0, 4))])
    return "".join(s)


@pytest.fixture(scope="module")
def planted_db():
    rng = np.random.default_rng(23)
    n = 60000
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    table = b"ACGT\n"
    pats = [ln.strip() for ln in open("/root/reference/db/pat.txt")
            if ln.strip()]
    db = SeqDB(
        codes=codes, table=table,
        entry_starts=np.array([0]), entry_lengths=np.array([n]),
        headers=["e1"],
    )

    def plant(at, s):
        for j, ch in enumerate(s):
            if at + j < n:
                db.codes[at + j] = table.index(ch.encode())

    slot = 300
    for i, p in enumerate(pats):
        plant(slot, p)
        slot += 700
        plant(slot, _mutate(rng, p, 1, True))
        slot += 700
        plant(slot, _mutate(rng, p, 2, True))
        slot += 700
        plant(slot, _mutate(rng, p, 1, False))
        slot += 700
    # adjacent duplicates (the 2k dedup window) and an end-straddler
    plant(41000, pats[0])
    plant(41000 + len(pats[0]) + 1, pats[0])
    plant(n - len(pats[0]) + 3, pats[0])
    return db, pats


@pytest.mark.parametrize("engine,k,indels", [
    ("halves", 1, True),
    ("halves", 2, True),
    ("halves", 1, False),
    ("halves", 2, False),
    ("bases", 1, True),
    ("bases", 2, True),
])
def test_gated_matches_host_engine(planted_db, engine, k, indels):
    db, pats = planted_db
    ps = build_pattern_set(pats, rev_comp=True)
    if engine == "bases":
        # exact_bases needs esb/eeb constraints to pick its seeds
        for pid in range(1, ps.n_total + 1):
            if pid % 2:
                ps.esb[pid] = max(len(ps.pattern(pid)) - k - 3, 1)
            else:
                ps.eeb[pid] = max(len(ps.pattern(pid)) - k - 3, 1)
    node = {"halves": 11, "bases": 8}[engine]
    host = PrimerMatchModel(db, ps, k=k, node=node, indels=indels)
    want = list(host.engine_hits())
    gated = PrimerMatchModel(db, ps, k=k, node=node, indels=indels)
    gated.pallas_interpret = True
    got = list(gated.engine_hits())
    assert got == want
    assert len(want) >= 10


def test_gate_superset_fuzz(planted_db):
    """Direct superset check: wherever the exact batched extension says
    ok, the device gate must say ok too (the converse may differ — the
    gate ignores constraints and charges every edit cost 1)."""
    from sequence_alignment_tools_tpu.engine.extend import (
        BatchSeedExtender, Extender)
    from sequence_alignment_tools_tpu.ops.gate import ExtendGate, GateTables

    import jax.numpy as jnp

    db, pats = planted_db
    rng = np.random.default_rng(7)
    for k, indels in [(1, True), (2, True), (1, False)]:
        seeds = [p[: len(p) // 2] for p in pats[:6]]
        exts = [p[len(p) // 2 :] for p in pats[:6]]
        S = len(seeds)
        # half lmatch, half rmatch geometry
        dirs = np.where(np.arange(S) % 2 == 0, 1, -1).astype(np.int32)
        geomB = np.where(dirs < 0,
                         [len(s) for s in seeds], 0).astype(np.int32)
        geomA = np.asarray(
            [len(seeds[i]) + len(exts[i]) + k for i in range(S)],
            np.int32) * (dirs < 0)
        la = np.zeros(S, np.int32)
        ra = np.zeros(S, np.int32)
        ext = Extender(k, "\n", False, False, indels, False)
        batch = BatchSeedExtender(ext, db, dirs, exts, la, ra, geomA,
                                  geomB)
        gate = ExtendGate(
            GateTables.from_seed_meta(db, exts, dirs, geomB, k,
                                      k if indels else 0, False, False),
            indels)
        C = 500
        anchors = rng.integers(20, len(db.codes) - 20, C).astype(np.int64)
        sids = rng.integers(0, S, C).astype(np.int32)
        ok_true, _, _ = batch(anchors, sids)
        ok_gate = np.asarray(
            gate(jnp.asarray(db.codes), anchors, sids))
        missed = ok_true & ~ok_gate
        assert not missed.any(), (
            f"k={k} indels={indels}: gate lost "
            f"{missed.sum()} true-ok candidates")


def test_chain_expansion_duplicate_and_nested_seeds():
    """Multi-seed escape resolution: the static chain table (two exact
    seeds matching one start are prefix-related, conv_scan._chain_table)
    must reproduce the exact rescan's candidate set for duplicate seeds
    and prefix-nested seeds, including ambiguity fallbacks."""
    import numpy as np

    from sequence_alignment_tools_tpu.io.database import SeqDB
    from sequence_alignment_tools_tpu.io.patterns import PatternSet
    from sequence_alignment_tools_tpu.ops.conv_scan import ConvScanner
    from sequence_alignment_tools_tpu.ops.tables import build_tables

    rng = np.random.default_rng(7)
    n = 1 << 21
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    db = SeqDB(codes=codes, table=b"ACGT\n", entry_starts=np.array([0]),
               entry_lengths=np.array([n]), headers=["x"])
    # duplicates, prefix chains, and an AMBIGUOUS pair: two chains with
    # the same (top, size): seeds "AACC*" vs "AACG*" both chaining with
    # the shared prefix "AAC"
    seeds = ["ACGTACG", "ACGTACG",     # duplicates (ids 1, 2)
             "ACGT", "ACGTAC",         # prefixes of 1 (ids 3, 4)
             "AAC", "AACCT", "AACGT",  # shared prefix, diverging (5-7)
             "GGTCA"]                  # independent (8)
    ps = PatternSet(patterns=[""] + seeds, esb=[0] * (len(seeds) + 1),
                    eeb=[0] * (len(seeds) + 1), n_forward=len(seeds))
    tables = build_tables(ps, db, wc=False, textn=False)
    sc = ConvScanner(tables, k=0)
    tab = sc._chain_table()
    assert tab is not None
    keymap, groups, w, winv = tab
    # this seed set has no colliding chain sums: the weight search keeps
    # the identity permutation, so keys below are plain id sums
    assert (w == np.arange(len(w))).all()
    # the chain of the duplicate pair + prefixes: matcher sids
    # {0, 1, 2, 3}, so the device-observable id SUM is 6
    g = keymap[6, 4]
    assert g >= 0 and list(groups[g]) == [0, 1, 2, 3]
    # "AACCT" chain {4, 5} (sum 9) and "AACGT" chain {4, 6} (sum 10):
    # distinct sums, so unambiguous; check they resolve to their own
    # chains
    g5 = keymap[9, 2]
    g6 = keymap[10, 2]
    assert list(groups[g5]) == [4, 5] and list(groups[g6]) == [4, 6]
    # expansion matches the exact rescan at real multi positions
    pos = np.asarray([100, 5000], np.int64)
    pat = [tables.pat_codes[1, :7], tables.pat_codes[5, :5]]
    codes[100 : 107] = pat[0]
    codes[5000 : 5005] = pat[1]
    ep, es, unres = sc._expand_chains(
        pos, np.asarray([6, 9], np.int64), np.asarray([4, 2], np.int64))
    assert not unres.any()
    want = {(100, 0), (100, 1), (100, 2), (100, 3), (5000, 4), (5000, 5)}
    assert set(zip(ep.tolist(), es.tolist())) == want
    rs, rp = sc.rescan_starts_arrays(codes, pos)
    assert set(zip(rs.tolist(), rp.tolist())) == want


def test_wpack_eos_adjacent_hits_exact():
    """Packed-window path (wpack_transpose): hits whose extension window
    touches an entry boundary must escape via the EOS flag bit and
    resolve exactly — engine output identical to the XLA oracle when
    matches sit immediately before/after EOS separators."""
    import numpy as np

    from sequence_alignment_tools_tpu.io.database import SeqDB
    from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
    from sequence_alignment_tools_tpu.models.primer_match import (
        PrimerMatchModel,
    )

    rng = np.random.default_rng(17)
    n = 1 << 18
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    db = SeqDB(codes=codes, table=b"ACGT\n", entry_starts=np.array([0]),
               entry_lengths=np.array([n]), headers=["x"])
    text = "".join("ACGT"[c] for c in codes[:40000])
    pats = [text[100:120], text[9000:9018]]
    # entry boundaries RIGHT at pattern edges: EOS immediately after a
    # planted occurrence, and immediately before another
    pc = [np.asarray([b"ACGT".index(ch.encode()) for ch in p], np.uint8)
          for p in pats]
    codes[30000 : 30000 + 20] = pc[0]
    codes[30020] = 4  # EOS right after
    codes[31000] = 4  # EOS right before
    codes[31001 : 31001 + 18] = pc[1]
    # and one pattern SPLIT by an EOS (must NOT match)
    codes[32000 : 32000 + 20] = pc[0]
    codes[32010] = 4
    ps = build_pattern_set(pats, rev_comp=True)
    m = PrimerMatchModel(db, ps, k=1)
    m.use_host = False
    sc = m._halves_ctx()[1]
    sc.pallas_interpret = True
    got = sorted(m.engine_hits())

    m2 = PrimerMatchModel(db, ps, k=1)
    m2.use_host = False
    o2 = m2._halves_ctx()[1]
    o2.use_pallas = False
    want = sorted(m2.engine_hits())
    assert got == want and want
    ends = [e for e, _p, _m in want]
    assert any(abs(e - 30020) <= 1 for e in ends)  # pre-EOS hit found
    assert any(abs(e - 31019) <= 1 for e in ends)  # post-EOS hit found
    assert not any(32005 < e < 32025 for e in ends)  # split = no match


def test_slot_overflow_segment_escape_parity():
    """Slot-cap overflow escapes are SEGMENT-granular ((tile*8+r)*nsegs+g,
    pallas_scan_gated_slots segraw layout): a dense same-phase hit cluster
    overflowing one segment's capg must rescan exactly that segment's
    positions — engine output identical to the host oracle.  Regression:
    the decode once misread the id as a row id and rescanned the wrong
    positions, losing every overflowed hit."""
    rng = np.random.default_rng(99)
    n = 1 << 17
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    # period-8 pattern: planting one long periodic region makes EVERY
    # stride-8 start a full-pattern match, so >64 left-half seed hits
    # land in ONE (phase row, segment) bucket -> capg overflow
    pat = ("ACGTTGCA" * 2)[:14]
    period = np.asarray([b"ACGT".index(c.encode()) for c in "ACGTTGCA"],
                        np.uint8)
    region = np.tile(period, 82)  # 81 stride-8 match starts
    codes[1000 : 1000 + len(region)] = region
    db = SeqDB(codes=codes, table=b"ACGT\n", entry_starts=np.array([0]),
               entry_lengths=np.array([n]), headers=["x"])
    ps = build_pattern_set([pat], rev_comp=True)
    m = PrimerMatchModel(db, ps, k=1)
    m.use_host = False
    sc = m._halves_ctx()[1]
    sc.pallas_interpret = True
    got = sorted(m.engine_hits())

    m2 = PrimerMatchModel(db, ps, k=1)
    m2.use_host = False
    o2 = m2._halves_ctx()[1]
    o2.use_pallas = False
    want = sorted(m2.engine_hits())
    assert got == want
    assert len(want) >= 80  # the planted cluster is all found


@pytest.mark.parametrize("fold", [2, 4])
def test_fold_lane_collisions(planted_db, fold):
    """The 2:1 half-fold levels in front of the compaction network
    (scan_kernel._slots_kernel fold) pair lane u with lane u + Ueff,
    i.e. positions t and t + j*T/fold of a tile.  Plant seed hits on
    several members of fold groups — including members whose extensions
    fail — and require output identity with the host engine: collided
    groups must come back through the cnt=30 escape + exact rescan of
    every group position (conv_scan._slots_decode)."""
    db, pats = planted_db
    rng = np.random.default_rng(31)
    codes = np.concatenate(
        [db.codes] + [rng.integers(0, 4, size=90000).astype(np.uint8)])
    table = b"ACGT\n"
    dbc = SeqDB(
        codes=codes, table=table,
        entry_starts=np.array([0]), entry_lengths=np.array([len(codes)]),
        headers=["e1"],
    )

    def plant(at, s):
        assert at + len(s) <= len(codes)
        for j, ch in enumerate(s):
            dbc.codes[at + j] = table.index(ch.encode())

    # discover the dispatch geometry (T, fold) on a THROWAWAY copy:
    # device copies cache by host-array identity (the resident-DB
    # contract), so the real array must not be scanned before planting
    ps = build_pattern_set(pats, rev_comp=True)
    dbp = SeqDB(codes=codes.copy(), table=table,
                entry_starts=np.array([0]),
                entry_lengths=np.array([len(codes)]), headers=["e1"])
    probe = PrimerMatchModel(dbp, ps, k=1, node=11, indels=True)
    probe.pallas_interpret = True
    _ow, scanner, _b, _d, _e, _g = probe._halves_ctx()
    scanner._SLOTS_FOLD = fold
    list(probe.engine_hits())
    T, _segl, _nsegs, gfold = scanner._slots_geom
    assert gfold == fold
    step = T // fold
    assert len(codes) > T + step + 40, (len(codes), T)
    p0 = pats[0]
    # hits on two members of a fold group (same phase r = t % 8)
    plant(1608, p0)
    plant(1608 + step, p0)
    # a true hit grouped with a seed-only hit (failing extension)
    seedlike = p0[: len(p0) // 2] + "A" * (len(p0) - len(p0) // 2 - 4)
    plant(3208, p0)
    plant(3208 + step * (fold - 1), seedlike)
    if fold == 4:  # three members of one group
        plant(5608, p0)
        plant(5608 + step, p0)
        plant(5608 + 3 * step, p0)

    host = PrimerMatchModel(dbc, ps, k=1, node=11, indels=True)
    host.use_host = True
    want = list(host.engine_hits())
    gated = PrimerMatchModel(dbc, ps, k=1, node=11, indels=True)
    gated.pallas_interpret = True
    _o2, sc2, *_rest = gated._halves_ctx()
    sc2._SLOTS_FOLD = fold
    got = list(gated.engine_hits())
    assert got == want
    ends = [e for e, _p, _v in got]
    assert 1608 + len(p0) in ends and 1608 + step + len(p0) in ends
