"""Mosaic Sellers kernel (ops.sellers._sellers_kernel): the in-kernel
k-edit candidate scan must produce the exact candidate SET of the XLA
block DP (shift_and_inexact.cc:249-350 semantics), including EOS gating,
multi-pattern boundaries (escaped + numpy-rescanned), segment halos and
slot overflow."""

import numpy as np
import pytest

from sequence_alignment_tools_tpu.io.database import SeqDB
from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
from sequence_alignment_tools_tpu.ops.sellers import (SEG, SellersScanner,
                                                      segment_matrix)
from sequence_alignment_tools_tpu.ops.tables import build_tables


def _mk(n, seed=0, entries=3):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    # entry boundaries: EOS sprinkled in (exercises the nrun gates)
    starts = sorted(rng.integers(1, n - 1, size=entries - 1).tolist())
    for s in starts:
        codes[s] = 4
    db = SeqDB(codes=codes, table=b"ACGT\n",
               entry_starts=np.array([0]), entry_lengths=np.array([n]),
               headers=["x"])
    return db


@pytest.mark.parametrize("seed,k,indels", [(0, 1, True), (1, 2, True),
                                           (2, 2, True), (3, 1, True)])
def test_kernel_matches_block_dp(seed, k, indels):
    n = 2 * 8 * SEG + 777  # partial trailing segment + pad tile
    db = _mk(n, seed=seed)
    codes = np.asarray(db.codes)
    text = "".join("ACGT"[c] if c < 4 else "A" for c in codes[:6000])
    pats = [text[100:118], text[3000:3020], text[5000:5015]]
    # plant a near-miss (1 edit) and an exact dup to force multi cases
    pats.append(pats[0][:10] + "T" + pats[0][11:])
    ps = build_pattern_set(pats, rev_comp=True)
    tables = build_tables(ps, db, wc=False, textn=False)

    ref = SellersScanner(tables, k=k, indels=indels, block=1 << 16)
    want = sorted((e, p) for e, p, _ in ref.scan(codes))

    sc = SellersScanner(tables, k=k, indels=indels)
    sc.pallas_interpret = True
    assert sc.kernel_available(n)
    ends, pids = sc.scan_pairs(codes)
    got = sorted(zip(ends.tolist(), pids.tolist()))
    assert got == want and want


def test_kernel_overflow_rows_escape():
    """A poly-A region makes one segment row exceed the slot cap: its
    whole row must rescan exactly (candidate set unchanged)."""
    n = 8 * SEG
    db = _mk(n, seed=9, entries=1)
    codes = np.asarray(db.codes)
    codes[SEG : SEG + 2000] = 0  # poly-A run inside segment row 1
    ps = build_pattern_set(["AAAAAAAAAA"])
    tables = build_tables(ps, db, wc=False, textn=False)

    ref = SellersScanner(tables, k=1, indels=True, block=1 << 16)
    want = sorted((e, p) for e, p, _ in ref.scan(codes))

    sc = SellersScanner(tables, k=1, indels=True)
    sc.pallas_interpret = True
    ends, pids = sc.scan_pairs(codes)
    got = sorted(zip(ends.tolist(), pids.tolist()))
    assert got == want and len(want) > 1500
