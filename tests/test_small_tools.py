"""Byte parity for the small drivers: exact_match, inexact_match, and the
compress_seq CLI's check/rebuild semantics."""

import io
import os
import random
import subprocess

import pytest

from sequence_alignment_tools_tpu.apps.exact_match import (
    parse_args as em_args, run as em_run,
)
from sequence_alignment_tools_tpu.apps.inexact_match import (
    parse_args as im_args, run as im_run,
)

PATS = ["CATCCTGCATCA", "TGGTAGGAGTTG", "AACCGGTTAACC"]
RC = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _rc(s):
    return "".join(RC[c] for c in reversed(s))


@pytest.fixture(scope="module")
def em_fasta(tmp_path_factory, oracle):
    d = tmp_path_factory.mktemp("em")
    rng = random.Random(7)
    seq = [rng.choice("ACGT") for _ in range(20000)]
    pos = 500
    for p in PATS:
        for v in (p, _rc(p)):
            seq[pos : pos + len(v)] = list(v)
            pos += len(v) + 211
        s2 = list(p)
        s2[4] = "ACGT"[("ACGT".index(s2[4]) + 1) % 4]
        seq[pos : pos + len(s2)] = s2
        pos += len(s2) + 211
    s = "".join(seq)
    path = d / "pl.fasta"
    with open(path, "w") as f:
        f.write(">e1 first\n")
        for i in range(0, 12000, 60):
            f.write(s[i : i + 60] + "\n")
        f.write(">e2 second\n")
        for i in range(12000, len(s), 60):
            f.write(s[i : i + 60] + "\n")
    patf = d / "pats.txt"
    with open(patf, "w") as f:
        f.write(" ".join(PATS) + "\n")
    subprocess.run(
        [os.path.join(oracle, "compress_seq"), "-i", str(path), "-n", "true"],
        check=True, capture_output=True,
    )
    return str(path), str(patf)


EM_CONFIGS = [["-q"], [], ["-r", "-q"], ["-r"], ["-b", "-q"], ["-k"]]


@pytest.mark.parametrize("cfg", EM_CONFIGS, ids=lambda c: " ".join(c) or "d")
def test_exact_match_parity(oracle, em_fasta, cfg):
    db, patf = em_fasta
    args = ["-i", db, "-P", patf] + cfg
    ref = subprocess.run(
        [os.path.join(oracle, "exact_match")] + args,
        capture_output=True, text=True, check=True,
    ).stdout
    buf = io.StringIO()
    em_run(em_args(args), buf)
    assert buf.getvalue() == ref


IM_CONFIGS = [
    ["-k", "0", "-q"],
    ["-k", "1", "-q"],
    ["-k", "1"],
    ["-k", "2", "-q"],
    ["-r", "-k", "1", "-q"],
    ["-k", "1", "-r"],
]


@pytest.mark.parametrize("cfg", IM_CONFIGS, ids=lambda c: " ".join(c))
def test_inexact_match_parity(oracle, em_fasta, cfg):
    db, patf = em_fasta
    args = ["-i", db, "-P", patf] + cfg
    ref = subprocess.run(
        [os.path.join(oracle, "inexact_match")] + args,
        capture_output=True, text=True, check=True,
    ).stdout
    buf = io.StringIO()
    im_run(im_args(args), buf)
    assert buf.getvalue() == ref


def test_compress_seq_cli(tmp_path, oracle):
    """Our CLI's artifacts must be byte-identical to the oracle's, and -c
    must report staleness correctly."""
    import shutil

    from sequence_alignment_tools_tpu.apps.compress_seq import main as cs_main

    src = tmp_path / "x.fasta"
    rng = random.Random(3)
    with open(src, "w") as f:
        for e in range(3):
            f.write(f">s{e} entry {e}\n")
            s = "".join(rng.choice("ACGT") for _ in range(997))
            for i in range(0, len(s), 61):
                f.write(s[i : i + 61] + "\n")
    ours = tmp_path / "ours"
    theirs = tmp_path / "theirs"
    ours.mkdir()
    theirs.mkdir()
    shutil.copy(src, ours / "x.fasta")
    shutil.copy(src, theirs / "x.fasta")
    assert cs_main(["-i", str(ours / "x.fasta"), "-n", "true", "-z", "true",
                    "-C", "false"]) == 0
    subprocess.run(
        [os.path.join(oracle, "compress_seq"), "-i", str(theirs / "x.fasta"),
         "-n", "true", "-z", "true", "-C", "false"],
        check=True, capture_output=True,
    )
    for ext in (".seq", ".hdr", ".idb", ".tbl", ".sqn", ".tbz", ".sqz"):
        a = (ours / ("x.fasta" + ext)).read_bytes()
        b = (theirs / ("x.fasta" + ext)).read_bytes()
        assert a == b, f"artifact {ext} differs"
    # -c true: up to date -> 0
    assert cs_main(["-i", str(ours / "x.fasta"), "-n", "true", "-z", "true",
                    "-c", "true"]) == 0
    # touch source -> rebuild needed -> 1
    os.utime(ours / "x.fasta")
    assert cs_main(["-i", str(ours / "x.fasta"), "-n", "true", "-z", "true",
                    "-c", "true"]) == 1
