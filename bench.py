"""Benchmark: multi-pattern exact scan throughput on the flat database.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- value: sustained scan throughput in Mbases/s on the real device for the
  BASELINE.json headline config (pat.txt-style primer set, both strands,
  ~16 MB DNA corpus — the pri_non_hum_nt geometry).
- vs_baseline: speedup over the reference C++ primer_match (-O3) on the same
  corpus/patterns, measured on this host if the oracle binary is available,
  else against the last recorded reference throughput in bench_baseline.json.
"""

import json
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, "bench_baseline.json")
CORPUS = "/tmp/sat_bench_corpus.fasta"
PATS = [
    "AGAAGCGAGTTCT", "CGCCAGCAGAGTT", "TTTTCTGAGAATCAAG",
    "CTATTGATAAGGGAGTGC", "ATGGCGGTTTTGTCGAA", "AAGAAAAGGGGGAAA",
    "TCATGAAGTAAAC", "TTGGCTGCTGCCCCCAG", "AGAAAAGGGGGAAA",
    "CTATTGATAAGGGAGTG",
]
CORPUS_BASES = 16_000_000


def make_corpus():
    if os.path.exists(CORPUS) and os.path.getsize(CORPUS) > CORPUS_BASES:
        return
    rng = np.random.default_rng(42)
    with open(CORPUS, "w") as f:
        per_entry = 2_000_000
        for e in range(CORPUS_BASES // per_entry):
            f.write(f">bench{e} synthetic benchmark entry {e}\n")
            seq = rng.integers(0, 4, size=per_entry)
            arr = np.frombuffer(b"ACGT", dtype=np.uint8)[seq]
            s = arr.tobytes().decode()
            for i in range(0, per_entry, 70):
                f.write(s[i : i + 70] + "\n")


def bench_tpu() -> float:
    """Sustained scan+extract throughput (bases/s), exact scan, both strands,
    through the production path: the Pallas MXU microblock filter kernel plus
    exact rescan of candidate regions (ops/pallas/scan_kernel.py)."""
    from sequence_alignment_tools_tpu.io.database import SeqDB
    from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
    from sequence_alignment_tools_tpu.ops.conv_scan import ConvScanner
    from sequence_alignment_tools_tpu.ops.tables import build_tables

    db = SeqDB.from_fasta(CORPUS)
    ps = build_pattern_set(PATS, rev_comp=True)
    tables = build_tables(ps, db, wc=False, textn=False)
    sc = ConvScanner(tables, k=0)
    n = len(db.codes)
    # warmup (compiles the kernel + rescan block, primes the allocator on
    # the exact dispatch pattern the timed loop uses)
    nhits = sum(1 for _ in sc.scan(db.codes))
    for _ in sc.scan_stream(db.codes for _ in range(1)):
        pass
    # sustained throughput: the grouped-fetch scan_stream pipeline keeps
    # the device busy across scans (dispatch ahead, compact results on
    # device, fetch groups on a background thread), so transport latency
    # amortizes as it would in production streaming; reps must exceed the
    # pipeline depth (256) to measure the overlapped steady state
    reps = 768
    best = float("inf")
    for _pass in range(3):  # best-of-3: the chip is shared, draws vary ±6%
        t0 = time.perf_counter()
        for _i, hits in sc.scan_stream(db.codes for _ in range(reps)):
            nhits = len(hits)
        best = min(best, (time.perf_counter() - t0) / reps)
    del nhits
    return n / best


def bench_reference() -> float | None:
    """Reference primer_match -c throughput (bases/s) on the same corpus."""
    ref = "/tmp/ref/primer_match"
    if not os.access(ref, os.X_OK):
        script = os.path.join(HERE, "tests", "oracle", "build_reference.sh")
        subprocess.run(["sh", script], capture_output=True)
    if not os.access(ref, os.X_OK):
        return None
    patfile = "/tmp/sat_bench_pats.txt"
    with open(patfile, "w") as f:
        f.write("\n".join(PATS) + "\n")
    t0 = time.perf_counter()
    subprocess.run(
        [ref, "-i", CORPUS, "-P", patfile, "-r", "-c"],
        check=True, capture_output=True,
    )
    dt = time.perf_counter() - t0
    return CORPUS_BASES / dt


def main():
    make_corpus()
    tpu_bps = bench_tpu()

    # the reference's CPU throughput is a constant of this host (~4.5 min
    # to measure) — reuse the recorded value once established
    ref_bps = None
    if os.path.exists(BASELINE_CACHE):
        ref_bps = json.load(open(BASELINE_CACHE))["reference_bases_per_sec"]
    if ref_bps is None:
        ref_bps = bench_reference()
        if ref_bps is not None:
            with open(BASELINE_CACHE, "w") as f:
                json.dump({"reference_bases_per_sec": ref_bps}, f)

    vs = (tpu_bps / ref_bps) if ref_bps else 0.0
    print(json.dumps({
        "metric": "exact scan throughput (20-pattern primer set, both strands)",
        "value": round(tpu_bps / 1e6, 2),
        "unit": "Mbases/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
