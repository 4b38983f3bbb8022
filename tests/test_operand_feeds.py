"""Operand-delivery variants of the scan kernels must be output-
equivalent: the in-VMEM build (production for the exact kernel), the
precomputed im2col HBM feed (production for the gated slots kernel),
and the one-hot-planes feed (measured-refuted for exact, kept testable
behind SAT_OHP_FEED_EXACT).  Interpret mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from sequence_alignment_tools_tpu.io.database import SeqDB
from sequence_alignment_tools_tpu.io.patterns import build_pattern_set
from sequence_alignment_tools_tpu.ops.conv_scan import ConvScanner
from sequence_alignment_tools_tpu.ops.pallas.scan_kernel import (
    _kernel_out,
    imcol_transpose,
    ohp_transpose,
)
from sequence_alignment_tools_tpu.ops.tables import build_tables


@pytest.fixture(scope="module")
def scan_cfg():
    rng = np.random.default_rng(3)
    n = 40000
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    pat = "ACGTACGTACGT"
    enc = np.array(["ACGT".index(c) for c in pat], np.uint8)
    for at in (5, 800, 8191, 8200, 20000, n - 13):
        codes[at : at + 12] = enc
    db = SeqDB(codes=codes, table=b"ACGT\n", entry_starts=np.array([0]),
               entry_lengths=np.array([n]), headers=["x"])
    ps = build_pattern_set([pat, "TTGGCCAAGGTT"], rev_comp=True)
    t = build_tables(ps, db, wc=False, textn=False)
    sc = ConvScanner(t, k=0)
    W, thr, classes = sc._pallas_weights()
    return jnp.asarray(codes), W, thr, classes, t


@pytest.mark.parametrize("emit", ["occupancy", "counts"])
def test_feed_variants_equivalent(scan_cfg, emit):
    cd, W, thr, classes, t = scan_cfg
    kw = dict(classes=classes, Lmax=t.Lmax, T=8192, MB=32,
              interpret=True, n_pat=t.P, emit=emit)
    base = np.asarray(_kernel_out(cd, W, thr, **kw))
    assert base.sum() > 0  # the planted hits register
    ohp = ohp_transpose(cd, T=8192, classes=classes)
    v_ohp = np.asarray(_kernel_out(cd, W, thr, ohp=ohp, **kw))
    assert (base == v_ohp).all()
    from sequence_alignment_tools_tpu.ops.pallas.scan_kernel import _na

    feed = imcol_transpose(cd, T=8192, classes=classes, na=_na(t.Lmax),
                           KPAD=W.shape[1])
    v_feed = np.asarray(_kernel_out(cd, W, thr, feed=feed, **kw))
    assert (base == v_feed).all()
