"""Brute-force oracle for ops.netflo.min_cost_flow (VERDICT r1 weak 5):
the flow solver behind walk_graph -O (the reference links NETFLO /
Goldberg's CS2 — netflo.h/cc, trans_prob roles) is pinned independently
of the walk by exhaustive enumeration on small random graphs."""

import itertools
import random

import pytest

from sequence_alignment_tools_tpu.ops.netflo import min_cost_flow


def _brute_min_cost(n, arcs, src, snk, want):
    """Exhaustive optimum: enumerate every integer flow assignment within
    arc capacities, keep conservation-feasible ones sending ``want``
    units src->snk, return the minimum total cost (None if infeasible)."""
    best = None
    ranges = [range(c + 1) for (_u, _v, c, _w, _t) in arcs]
    for assign in itertools.product(*ranges):
        net = [0] * n
        cost = 0
        for f, (u, v, _c, w, _t) in zip(assign, arcs):
            net[u] -= f
            net[v] += f
            cost += f * w
        ok = net[snk] == want and net[src] == -want and all(
            net[x] == 0 for x in range(n) if x not in (src, snk))
        if ok and (best is None or cost < best):
            best = cost
    return best


def _solver_cost(n, arcs, src, snk, want):
    try:
        flows = min_cost_flow(n, arcs, src, snk, want)
    except ValueError:
        return None
    # verify the returned flows are themselves feasible
    net = [0] * n
    cost = 0
    for f, (u, v, c, w, _t) in zip(flows, arcs):
        assert 0 <= f <= c
        net[u] -= f
        net[v] += f
        cost += f * w
    assert net[src] == -want and net[snk] == want
    assert all(net[x] == 0 for x in range(n) if x not in (src, snk))
    return cost


@pytest.mark.parametrize("seed", range(30))
def test_min_cost_flow_vs_bruteforce(seed):
    rng = random.Random(seed)
    n = rng.randint(3, 5)
    src, snk = 0, n - 1
    m = rng.randint(3, 7)
    arcs = []
    for i in range(m):
        u = rng.randrange(n)
        v = rng.randrange(n)
        while v == u:
            v = rng.randrange(n)
        arcs.append((u, v, rng.randint(0, 3), rng.randint(0, 9), i))
    want = rng.randint(1, 3)
    brute = _brute_min_cost(n, arcs, src, snk, want)
    got = _solver_cost(n, arcs, src, snk, want)
    assert got == brute, (arcs, want, got, brute)


def test_min_cost_flow_infeasible():
    # capacity cut of 1 < demand 2
    arcs = [(0, 1, 1, 5, 0), (1, 2, 3, 1, 1)]
    with pytest.raises(ValueError):
        min_cost_flow(3, arcs, 0, 2, 2)
