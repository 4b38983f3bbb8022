"""FASTA parsing (host side).

Replaces the reference's streamed/indexed FASTA readers
(``fasta_io.t:448-751``) with a whole-file numpy parse: the TPU data model
wants the entire database as one flat packed array anyway, so there is no
char-at-a-time streaming layer.  Gzip input is supported like the reference's
``GZChars`` (``char_io.h:105-127``).
"""

from __future__ import annotations

import gzip
import io as _io
from typing import Iterator


def _open(path: str):
    if path == "-":
        import sys

        return sys.stdin.buffer
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f)
    return f


def iter_fasta(path: str) -> Iterator[tuple[str, bytes]]:
    """Yield (defline, sequence_bytes) per entry.  Whitespace inside sequence
    lines is stripped; deflines exclude the leading '>' and the newline."""
    header = None
    chunks: list[bytes] = []
    with _open(path) as f:
        for raw in f:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                if header is not None:
                    yield header, b"".join(chunks)
                header = line[1:].decode("latin-1")
                chunks = []
            elif header is not None:
                chunks.append(bytes(line.translate(None, b" \t")))
            elif line:
                # sequence data before any '>' — treat as an unnamed entry
                header = ""
                chunks = [bytes(line.translate(None, b" \t"))]
        if header is not None:
            yield header, b"".join(chunks)


def read_fasta(path: str) -> list[tuple[str, bytes]]:
    return list(iter_fasta(path))


def write_fasta(path: str, entries: list[tuple[str, bytes]], width: int = 60) -> None:
    with open(path, "wb") as f:
        for header, seq in entries:
            f.write(b">" + header.encode("latin-1") + b"\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + b"\n")
