"""Myers bit-parallel k-edit kernel (ops.pallas.myers_kernel): the
candidate set {(end, pid): mindist <= k} must equal the XLA Sellers
block DP's (ops.sellers._sellers_block) — the filter engine's inner
scan contract (shift_and_inexact.cc:249-350 semantics: per-boundary
min edit distance with EOS barring all error transitions).

Covers segment-boundary straddles (the kernel's warmup-halo logic),
EOS resets, planted 1- and 2-edit hits, and array-edge windows."""

import numpy as np
import pytest

from sequence_alignment_tools_tpu.io.database import SeqDB
from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
from sequence_alignment_tools_tpu.ops.sellers import SellersScanner
from sequence_alignment_tools_tpu.ops.tables import build_tables


def _mk(n, pats, k, seed, eos_at=(), plant=()):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    table = b"ACGT\n"
    for at in eos_at:
        codes[at] = 4
    for at, s in plant:
        for j, ch in enumerate(s):
            codes[at + j] = table.index(ch.encode())
    db = SeqDB(codes=codes, table=table, entry_starts=np.array([0]),
               entry_lengths=np.array([n]), headers=["e1"])
    ps = build_pattern_set(pats)
    tables = build_tables(ps, db, wc=False, textn=False)
    sc = SellersScanner(tables, k=k, indels=True)
    sc.pallas_interpret = True
    sc._MY_SEGC = 64  # tiny segments: tile covers 64K, halo every 64
    return db, sc


@pytest.mark.parametrize("seed,k", [(0, 1), (1, 2), (2, 2)])
def test_myers_matches_sellers_dp(seed, k):
    n = 66_000  # > one 1024-segment tile at segc=64: pad tile edge too
    pats = ["ACGTACGTACGT", "TTGACCATGAC", "CCCGGGTTTAA"]
    # plant: an exact hit mid-segment, one straddling a segment boundary
    # (64-multiple), one right at the array tail, near-miss variants
    plant = [
        (1000, "ACGTACGTACGT"),
        (64 * 37 - 5, "TTGACCATGAC"),
        (n - 13, "CCCGGGTTTAA"),
        (2000, "ACGTACCTACGT"),   # 1 sub
        (3000, "ACGTACGACGT"),    # 1 del
        (4000, "ACGTAACGTACGT"),  # 1 ins
        (5000, "ACCTACGTACCT"),   # 2 subs
    ]
    eos_at = (1500, 64 * 50, 7000)
    db, sc = _mk(n, pats, k, seed, eos_at, plant)
    assert sc.myers_available(n)

    ends_m, pids_m = sc._myers_pairs(db.codes)
    got = set(zip(ends_m.tolist(), pids_m.tolist()))

    sc2 = SellersScanner(sc.tables, k=k, indels=True)  # XLA oracle path
    want = {(e, p) for e, p, _d in sc2.scan(db.codes)}
    assert got == want
    assert len(want) > 8  # planted + random near-misses actually fire


def test_myers_eos_adjacent():
    """Hits immediately before/after an EOS and windows that would only
    reach distance k by crossing it."""
    n = 66_000
    pats = ["ACGTTGCA"]
    eos_at = tuple(range(100, 3000, 137))
    db, sc = _mk(n, pats, 1, 7, eos_at,
                 plant=[(96, "ACGT"), (101, "TGCA"),  # split by EOS @100
                        (236, "ACGTTGCA")])           # ends right at 244
    ends_m, pids_m = sc._myers_pairs(db.codes)
    got = set(zip(ends_m.tolist(), pids_m.tolist()))
    sc2 = SellersScanner(sc.tables, k=1, indels=True)
    want = {(e, p) for e, p, _d in sc2.scan(db.codes)}
    assert got == want
