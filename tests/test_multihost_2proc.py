"""Real 2-process jax.distributed bring-up (VERDICT r2 item 6): two
coordinator-connected CPU processes form the ('host', 'chip') = (2, 4)
mesh of parallel.multihost and run the 2-D sharded count scan — count
parity against an independent numpy oracle, and ``init_distributed``
actually returning (i, 2) in each process.

The single-process virtual-grid form of the same computation is covered
by ``__graft_entry__.dryrun_multichip``; this test is the DCN-row proof
that the skeleton really spans processes (SURVEY §2f distributed comm
backend)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_count_parity(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # the workers force their own platform/device flags; scrub any
    # conftest-applied single-process state that must not leak in
    env.pop("SAT_COORDINATOR", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["XLA_FLAGS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err.decode()[-3000:]
        assert b"ok" in out

    # numpy oracle: exact-window count per pattern over the same problem
    P, Lmax, alpha = 6, 10, 5
    rng = np.random.default_rng(0)
    n = 8 * 512
    codes = rng.integers(0, 4, size=n).astype(np.int32)
    pats = rng.integers(0, 4, size=(P, Lmax))
    want = np.zeros(P, np.int32)
    for p in range(P):
        m = np.ones(n - Lmax + 1, bool)
        for j in range(Lmax):
            m &= codes[j : n - Lmax + 1 + j] == pats[p, j]
        want[p] = int(m.sum())

    d0 = np.load(tmp_path / "p0.npz")
    d1 = np.load(tmp_path / "p1.npz")
    assert (int(d0["pid"]), int(d0["nproc"])) == (0, 2)
    assert (int(d1["pid"]), int(d1["nproc"])) == (1, 2)
    np.testing.assert_array_equal(d0["counts"], want)
    np.testing.assert_array_equal(d1["counts"], want)
