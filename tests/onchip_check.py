"""On-chip kernel parity: the COMPILED Mosaic scan pipeline vs the XLA
block path, on whatever accelerator backend is live (run as a subprocess
by test_tpu_hardware.py with the conftest's forced-CPU env stripped).

Covers the kernel configuration space that interpret-mode tests exercise
only on CPU: the single-K-chunk DNA path, the multi-K-chunk wide-alphabet
(peptide) path, and the pattern-tiled (P > 128) grid.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _check(db, pats, rev_comp, ks, label):
    from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
    from sequence_alignment_tools_tpu.ops.conv_scan import ConvScanner
    from sequence_alignment_tools_tpu.ops.tables import build_tables

    ps = build_pattern_set(pats, rev_comp=rev_comp)
    for k in ks:
        tables = build_tables(ps, db, wc=False, textn=False)
        got = sorted(ConvScanner(tables, k=k, use_pallas=True).scan(db.codes))
        want = sorted(
            _xla_scanner(tables, k).scan(db.codes))
        assert got == want, (label, k, len(got), len(want))
        assert got, (label, k, "no hits planted?")
        print(f"{label} k={k}: {len(got)} hits OK", flush=True)


def _xla_scanner(tables, k):
    from sequence_alignment_tools_tpu.ops.conv_scan import ConvScanner

    sc = ConvScanner(tables, k=k, use_pallas=False)
    sc.use_host = False  # the check compares compiled Mosaic vs pure XLA
    return sc


def main():
    import jax

    backend = jax.default_backend()
    assert backend != "cpu", f"on-chip check needs an accelerator, got {backend}"
    from sequence_alignment_tools_tpu.io.database import SeqDB

    rng = np.random.default_rng(11)

    # --- DNA, single K chunk, P <= 128 ---------------------------------
    n = 1 << 21
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    table = b"ACGT\n"
    db = SeqDB(codes=codes, table=table, entry_starts=np.array([0]),
               entry_lengths=np.array([n]), headers=["e1"])
    pats = [ln.strip() for ln in open("/root/reference/db/pat.txt")
            if ln.strip()]
    for i, p in enumerate(pats):
        at = 4000 + 99991 * i
        for j, ch in enumerate(p):
            db.codes[at + j] = table.index(ch.encode())
    _check(db, pats, True, (0, 1), "dna")

    # --- DNA, pattern-tiled grid (P > 128) -----------------------------
    def take(s, L):
        return "".join("ACGT"[c] for c in codes[s : s + L])

    many = [take(1000 + 9973 * i, 14 + i % 7) for i in range(80)]
    _check(db, many, True, (0,), "dna-ptiled")  # 160 patterns, 2 tiles

    # --- peptide, wide alphabet (multi K chunk) ------------------------
    AA = "ACDEFGHIKLMNPQRSTVWY"
    seqs = ["".join(rng.choice(list(AA), 120_000)) for _ in range(3)]
    fd, path = tempfile.mkstemp(suffix=".fasta")
    os.write(fd, "\n".join(f">p{e}\n{s}" for e, s in enumerate(seqs)).encode())
    os.close(fd)
    pdb = SeqDB.from_fasta(path)
    pcodes = np.asarray(pdb.codes)
    eos = pdb.eos_code

    def ptake(s, L):
        sub = pcodes[s : s + L]
        return pdb.decode(s, s + L) if (sub != eos).all() else None

    ppats = [p for p in (ptake(5000 + 9973 * i, 8 + i % 5) for i in range(8))
             if p]
    assert len(ppats) >= 6
    _check(pdb, ppats, False, (0, 1), "peptide")

    # --- COMPILED Mosaic under shard_map on a real 1-device mesh --------
    # (the regular suite only ever runs this interpret-mode on the CPU
    # mesh; this pins that the sharded pipeline lowers + executes on the
    # actual accelerator)
    from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
    from sequence_alignment_tools_tpu.ops.conv_scan import ConvScanner
    from sequence_alignment_tools_tpu.ops.tables import build_tables
    from sequence_alignment_tools_tpu.parallel.shard import (
        make_mesh, sharded_pallas_scan_hits)

    mesh = make_mesh(jax.devices()[:1])
    ps = build_pattern_set(pats[:8], rev_comp=True)
    tables = build_tables(ps, db, wc=False, textn=False)
    sc = ConvScanner(tables, k=0, use_pallas=True)
    sc.use_host = False
    want = sorted(sc.scan(db.codes))
    got = sorted(sharded_pallas_scan_hits(sc, np.asarray(db.codes), mesh,
                                          interpret=False))
    assert got == want and got, ("shard_map-1dev", len(got), len(want))
    print(f"shard_map 1-dev: {len(got)} hits OK", flush=True)

    # --- Myers bit-parallel k-edit kernel (packed pattern pairs) -------
    # every BENCH_r* k-edit row rides this; the parity oracle is the XLA
    # Sellers block DP (an independent formulation)
    from sequence_alignment_tools_tpu.ops.sellers import SellersScanner

    mpats = [take(2000 + 7919 * i, L)
             for i, L in enumerate((13, 13, 16, 18, 17, 15, 14, 17))]
    mps = build_pattern_set(mpats, rev_comp=True)
    mtables = build_tables(mps, db, wc=False, textn=False)
    for k in (1, 2):
        dev = SellersScanner(mtables, k=k, indels=True)
        assert dev.myers_available(n)
        ends, pids = dev.scan_pairs(np.asarray(db.codes))
        got = sorted(zip(ends.tolist(), pids.tolist()))
        ref = SellersScanner(mtables, k=k, indels=True, block=1 << 18)
        want = sorted((e, p) for e, p, _ in ref.scan(db.codes))
        assert got == want and got, ("myers", k, len(got), len(want))
        print(f"myers k={k}: {len(got)} hits OK", flush=True)

    # --- Sellers row-DP kernel (Lmax > 31: Myers ineligible) -----------
    lpats = [take(3000 + 7919 * i, 40) for i in range(4)]
    lps = build_pattern_set(lpats, rev_comp=True)
    ltables = build_tables(lps, db, wc=False, textn=False)
    dev = SellersScanner(ltables, k=2, indels=True)
    assert not dev.myers_available(n) and dev.kernel_available(n)
    ends, pids = dev.scan_pairs(np.asarray(db.codes))
    got = sorted(zip(ends.tolist(), pids.tolist()))
    ref = SellersScanner(ltables, k=2, indels=True, block=1 << 18)
    want = sorted((e, p) for e, p, _ in ref.scan(db.codes))
    assert got == want and got, ("sellers-dp", len(got), len(want))
    print(f"sellers row-DP k=2: {len(got)} hits OK", flush=True)

    # --- wide-alphabet WILDCARD config (IUPAC classes in the weights) --
    wpats = [take(5000 + 9103 * i, 16) for i in range(6)]
    wpats = [p[:6] + "N" + p[7:12] + "R" + p[13:] for p in wpats]
    wps = build_pattern_set(wpats, rev_comp=True)
    wtables = build_tables(wps, db, wc=True, textn=False)
    got = sorted(ConvScanner(wtables, k=0, use_pallas=True).scan(db.codes))
    want = sorted(_xla_scanner(wtables, 0).scan(db.codes))
    assert got == want and got, ("wildcard", len(got), len(want))
    print(f"wildcard k=0: {len(got)} hits OK", flush=True)

    # --- the k>0 gated slots pipeline (halves engine, wpack form) ------
    from sequence_alignment_tools_tpu.io.patterns import build_pattern_set \
        as _bps
    from sequence_alignment_tools_tpu.models.primer_match import (
        PrimerMatchModel,
    )

    gdb = SeqDB(codes=db.codes, table=table, entry_starts=np.array([0]),
                entry_lengths=np.array([n]), headers=["e1"])
    gpats = [take(8000 + 10007 * i, 16) for i in range(8)]
    gps = _bps(gpats, rev_comp=True)
    mg = PrimerMatchModel(gdb, gps, k=1, mesh=None)
    mg.use_host = False
    assert mg.engine == "halves", mg.engine
    got = sorted(mg.engine_hits())
    mh = PrimerMatchModel(gdb, gps, k=1, mesh=None)
    mh.use_host = True
    want = sorted(mh.engine_hits())
    assert got == want and got, ("gated-slots", len(got), len(want))
    print(f"gated slots k=1: {len(got)} hits OK", flush=True)

    # --- gapped-seed engine (gs_hash_table): the sparse template
    # correlation's COMPILED device route vs the full host engine ------
    gspats = [take(11000 + 10009 * i, 20) for i in range(5)]
    gs_ps = _bps(gspats, rev_comp=False)
    m15 = PrimerMatchModel(gdb, gs_ps, k=1, node=15, mesh=None)
    m15.use_host = False
    assert m15.engine == "gs"
    got = sorted(m15.engine_hits())
    m15h = PrimerMatchModel(gdb, gs_ps, k=1, node=15, mesh=None)
    m15h.use_host = True
    want = sorted(m15h.engine_hits())
    assert got == want and got, ("gs-engine", len(got), len(want))
    print(f"gs engine k=1: {len(got)} hits OK", flush=True)

    # --- pattern-blocked exact path (P > _PBLOCK device passes) --------
    bpats = [take(1000 + 997 * i, 14) for i in range(1200)]
    bpats = list(dict.fromkeys(bpats))
    bps2 = _bps(bpats, rev_comp=True)  # P > 2048 -> 2 pattern blocks
    btables = build_tables(bps2, db, wc=False, textn=False)
    bsc = ConvScanner(btables, k=0, use_pallas=True)
    bsc.use_host = False
    assert btables.P > bsc._PBLOCK
    got = sorted(bsc.scan(db.codes))
    want = sorted(_xla_scanner(btables, 0).scan(db.codes))
    assert got == want and got, ("pattern-blocked", len(got), len(want))
    print(f"pattern-blocked P={btables.P}: {len(got)} hits OK", flush=True)

    print("ONCHIP OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
