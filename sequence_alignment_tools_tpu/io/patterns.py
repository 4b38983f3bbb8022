"""Pattern (primer/peptide) input loaders and the pattern registry.

Mirrors the reference's pattern-input surface: whitespace-separated files/
strings (``-p``/``-P``), FASTA pattern files (``-F``), UniSTS (``-S``)
(primer_match.cc:871-924, sts_io.h:11-96), with per-pattern exact-start/
exact-end constraints folded from ``-s/-e/-5/-3`` exactly as
primer_match.cc:991-1080 does (negative = "~"-inexact sense).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..utils.iupac import reverse_comp, reverse


@dataclass
class STSEntry:
    """One UniSTS record (sts_io.h:11-96)."""

    id: str = ""
    forward_primer: str = ""
    reverse_primer: str = ""
    sizelb: int = 0
    sizeub: int = 0
    accession: str = ""
    chrom: str = ""
    altacc: str = ""
    species: str = ""

    @property
    def size_str(self) -> str:
        if self.sizeub != self.sizelb:
            return f"{self.sizelb}-{self.sizeub}"
        return str(self.sizelb)


def read_sts(path: str) -> list[STSEntry]:
    """Parse UniSTS: tab-separated id, fwd, rev, size[-size], accession,
    chrom, altacc, species (sts_io.cc operator>>)."""
    out = []
    fh = open(path) if path != "-" else __import__("sys").stdin
    for line in fh:
        line = line.rstrip("\n")
        if not line.strip():
            continue
        f = line.split("\t")
        f += [""] * (8 - len(f))
        size = f[3].strip()
        if "-" in size:
            lb, ub = size.split("-", 1)
            try:
                sizelb, sizeub = int(lb), int(ub)
            except ValueError:
                sizelb = sizeub = 0
        else:
            try:
                sizelb = sizeub = int(size)
            except ValueError:
                sizelb = sizeub = 0
        out.append(
            STSEntry(f[0], f[1], f[2], sizelb, sizeub, f[4], f[5], f[6], f[7])
        )
    if path != "-":
        fh.close()
    return out


def read_pattern_words(path: str) -> list[str]:
    """Whitespace-separated patterns (-P); '-' = stdin."""
    import sys

    data = sys.stdin.read() if path == "-" else open(path).read()
    return data.split()


def read_pattern_fasta(path: str) -> tuple[list[str], list[str]]:
    """FASTA patterns (-F): returns (sequences, deflines)."""
    from .fasta import iter_fasta

    seqs, defs = [], []
    for header, seq in iter_fasta(path):
        s = seq.decode("latin-1")
        if s == "":
            break
        seqs.append(s)
        defs.append(header)
    return seqs, defs


@dataclass
class PatternSet:
    """The registry handed to engines: ids 1..n forward, n+1..2n revcomp
    (primer_match.cc:1026-1031), with per-pattern (esb, eeb) exact-base
    constraints."""

    patterns: list[str] = field(default_factory=list)  # index 0 unused
    esb: list[int] = field(default_factory=list)
    eeb: list[int] = field(default_factory=list)
    n_forward: int = 0
    deflines: list[str] = field(default_factory=list)
    sts: list[STSEntry] = field(default_factory=list)

    @property
    def n_total(self) -> int:
        return len(self.patterns) - 1

    def pattern(self, pid: int) -> str:
        return self.patterns[pid]

    def is_revcomp(self, pid: int) -> bool:
        return pid > self.n_forward

    def forward_index(self, pid: int) -> int:
        return pid - self.n_forward if pid > self.n_forward else pid

    @property
    def max_len(self) -> int:
        return max((len(p) for p in self.patterns[1:]), default=0)

    @property
    def min_len(self) -> int:
        return min((len(p) for p in self.patterns[1:]), default=0)


def _fold_constraints(n: int, stlen: int, edlen: int, fplen: int, tplen: int,
                      is_rc: bool) -> tuple[int, int]:
    """Fold -s/-e/-5/-3 into (esb, eeb) for one pattern of length ``n``
    (primer_match.cc:991-1011 forward, :1029-1056 revcomp).  Negative values
    carry the '~' inexact sense."""
    esb = 0
    eeb = 0
    if not is_rc:
        if stlen > 0:
            esb = stlen
        if fplen > esb:
            esb = max(esb, fplen)
        if edlen < 0 and n + edlen > esb:
            esb = n + edlen
        if tplen < 0 and n + tplen > esb:
            esb = n + tplen
        if edlen > 0:
            eeb = edlen
        if tplen > eeb:
            eeb = tplen
        if stlen < 0 and n + stlen > eeb:
            eeb = n + stlen
        if fplen < 0 and n + fplen > eeb:
            eeb = n + fplen
    else:
        if stlen > 0:
            esb = stlen
        if tplen > esb:
            esb = tplen
        if edlen < 0 and n + edlen > esb:
            esb = n + edlen
        if fplen < 0 and n + fplen > esb:
            esb = n + fplen
        if edlen > 0:
            eeb = edlen
        if fplen > eeb:
            eeb = fplen
        if stlen < 0 and n + stlen > eeb:
            eeb = n + stlen
        if tplen < 0 and n + tplen > eeb:
            eeb = n + tplen
    return esb, eeb


def build_pattern_set(
    patterns: list[str],
    rev_comp: bool = False,
    translate: bool = False,
    uppercase: bool = False,
    stlen: int = 0,
    edlen: int = 0,
    fplen: int = 0,
    tplen: int = 0,
    deflines: list[str] | None = None,
    sts: list[STSEntry] | None = None,
) -> PatternSet:
    if uppercase:
        patterns = [p.upper() for p in patterns]
    n = len(patterns)
    ps = PatternSet(n_forward=n, deflines=deflines or [], sts=sts or [])
    both = rev_comp or translate
    ps.patterns = [""] * (1 + (2 * n if both else n))
    ps.esb = [0] * len(ps.patterns)
    ps.eeb = [0] * len(ps.patterns)
    for i, p in enumerate(patterns, start=1):
        ps.patterns[i] = p
        ps.esb[i], ps.eeb[i] = _fold_constraints(
            len(p), stlen, edlen, fplen, tplen, is_rc=False
        )
        if both:
            rc = reverse(p) if translate else reverse_comp(p)
            ps.patterns[i + n] = rc
            ps.esb[i + n], ps.eeb[i + n] = _fold_constraints(
                len(p), stlen, edlen, fplen, tplen, is_rc=True
            )
    return ps
