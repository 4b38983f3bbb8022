"""TPU-native multi-pattern sequence matching framework.

A ground-up re-design of the PrimerMatch/PeptideScan capability set
(EdwardsLabProjects/sequence-alignment-tools) for TPU hardware:

- The sequence database is a flat, EOS-delimited ``uint8`` code array in HBM
  (the reference's ``.sqn`` normalized flat coordinate space,
  ``fasta_io.t:139-263``), position-sharded across a device mesh with static
  overlap halos.
- Exact and k-mismatch multi-pattern scanning runs as one-hot correlation on
  the MXU (the reference scans char-at-a-time through an Aho-Corasick keyword
  tree / shift-and bitvectors, ``keyword_tree.t:427-486``,
  ``shift_and.cc:218-254``).
- k-edit (indel) scanning runs as a row-vectorized Sellers semi-global DP
  with a cumulative-min associative scan for the insertion term (same
  candidate set as the reference's Wu-Manber bitvectors,
  ``shift_and_inexact.cc:249-350``).
- Candidate clusters are verified by a banded anchored edit-distance DP that
  reproduces the reference's tie-breaking and constraint semantics bit-for-bit
  (``pattern_alignment.cc:117-705``).

Import alias: ``import sequence_alignment_tools_tpu as sat``.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
