"""Round-13 wave A model tests: the hash-table companions.

- Robin Hood: the committed sorted-greedy fold must equal an ACTUAL
  Robin Hood insertion simulation (poorest-first displacement with the
  (home, key) priority tie-break) run under multiple insertion orders —
  the canonical-arrangement order-independence claim — and its total
  displacement must equal FCFS linear probing's (the parking-function
  invariant linking it to linear_probe_displacement_census).
- Cuckoo: the census must equal a union-find replica over the same
  committed hashes, and the component classification logic is pinned on
  planted tree / unicyclic / infeasible instances.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------- Robin Hood


def _rh_simulate(pairs, M, order):
    """Real Robin Hood insertion: on collision the key with the larger
    probe distance keeps the slot; ties by (home, key) priority (smaller
    wins the slot = is placed earlier in the canonical order)."""
    table = [None] * M  # entries: (home, key)
    for idx in order:
        home, key = pairs[idx]
        cur = (home, key)
        s = home

        def dist(entry, slot):
            return (slot - entry[0]) % M

        while True:
            if table[s] is None:
                table[s] = cur
                break
            # rob the rich, give to the poor: the key with the LARGER
            # probe distance keeps the slot; ties by (home, key) priority
            # (equal distance at the same slot implies equal home, so the
            # smaller key — canonically earlier — steals)
            d_new = dist(cur, s)
            d_res = dist(table[s], s)
            if d_res > d_new or (d_res == d_new and table[s] < cur):
                pass  # resident keeps it
            else:
                table[s], cur = cur, table[s]
            s = (s + 1) % M
    disp = [
        (s - e[0]) % M for s, e in enumerate(table) if e is not None
    ]
    return sum(disp), sum(d * d for d in disp), max(disp) if disp else 0


def _fcfs_total(pairs, M, order):
    table = [None] * M
    total = 0
    for idx in order:
        home, _ = pairs[idx]
        s, d = home, 0
        while table[s] is not None:
            s = (s + 1) % M
            d += 1
        table[s] = home
        total += d
    return total


import pytest


@pytest.mark.parametrize(
    "sf", [SF, "/root/testdata/sf0.1"]
)  # sf0.1: 1500 keys, real displacement mass (Σd ≈ 2400, wraps exercised)
def test_robin_hood_fold_model(spark, sf):
    from hpmr_spark.operators.hashtable_sim2_queries import (
        _RH_KMOD,
        _RH_M,
        robin_hood_displacement_fold,
    )

    SF = sf
    keys = sorted(
        {
            r["c_custkey"]
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
            if r["c_custkey"] % _RH_KMOD == 0
        }
    )
    pairs = [(_py_hash60(f"rh:{k}") % _RH_M, k) for k in keys]
    n = len(pairs)
    orders = [list(range(n)), list(reversed(range(n)))]
    # a deterministic shuffle as a third order
    orders.append(sorted(range(n), key=lambda i: _py_hash60(f"o:{i}")))
    sims = {_rh_simulate(pairs, _RH_M, o) for o in orders}
    assert len(sims) == 1  # canonical arrangement is order-independent
    sm, s2, mx = sims.pop()
    r = robin_hood_displacement_fold(spark, SF).collect()[0]
    assert (r["table_size"], r["n_keys"]) == (_RH_M, n)
    assert r["total_displacement"] == sm
    assert r["sum_sq_displacement"] == s2
    assert r["max_displacement"] == mx
    # parking-function invariant: Σd equals FCFS linear probing's total
    # under any insertion order
    for o in orders:
        assert _fcfs_total(pairs, _RH_M, o) == sm


def test_robin_hood_wraparound_synthetic():
    """The two-pass fold idea on a wrap-heavy instance: simulation vs the
    sorted-greedy canonical placement (what the committed fold computes)."""
    M = 8
    pairs = [(6, 1), (6, 2), (7, 3), (7, 4), (0, 5), (3, 6)]
    sim = _rh_simulate(pairs, M, list(range(len(pairs))))
    # sorted-greedy with two passes (the committed fold, in Python)
    hs = sorted(pairs)
    frontier = -1.0
    stats = [0.0, 0.0, 0.0]
    seq = [float(h) for h, _ in hs] + [float(h) + M for h, _ in hs]
    for i, h in enumerate(seq):
        pos = max(frontier + 1.0, h)
        frontier = pos
        if i >= len(hs):
            d = pos - h
            stats[0] += d
            stats[1] += d * d
            stats[2] = max(stats[2], d)
    assert (int(stats[0]), int(stats[1]), int(stats[2])) == sim


# ------------------------------------------------------------- cuckoo


class _DSU:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _cuckoo_census(edges):
    """(n_components, n_tree, n_unicyclic, n_infeasible,
    keys_in_infeasible, max_nodes) from a key-edge list via union-find."""
    dsu = _DSU()
    for a, b in edges:
        dsu.union(a, b)
    nodes = defaultdict(set)
    nkeys = Counter()
    for a, b in edges:
        r = dsu.find(a)
        nodes[r].update((a, b))
        nkeys[r] += 1
    tree = uni = inf = kinf = 0
    mx = 0
    for r, ns in nodes.items():
        e, v = nkeys[r], len(ns)
        mx = max(mx, v)
        if e == v - 1:
            tree += 1
        elif e == v:
            uni += 1
        else:
            inf += 1
            kinf += e
    return (len(nodes), tree, uni, inf, kinf, mx)


def test_cuckoo_census_model(spark):
    from hpmr_spark.operators.hashtable_sim2_queries import (
        _CK_KMOD,
        _CK_M,
        cuckoo_feasibility_census,
    )

    keys = sorted(
        {
            r["c_custkey"]
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
            if r["c_custkey"] % _CK_KMOD == 0
        }
    )
    edges = [
        (
            _py_hash60(f"ck1:{k}") % _CK_M,
            _py_hash60(f"ck2:{k}") % _CK_M,
        )
        for k in keys
    ]
    nc, tree, uni, inf, kinf, mx = _cuckoo_census(edges)
    r = cuckoo_feasibility_census(spark, SF).collect()[0]
    assert r["n_keys"] == len(keys)
    assert r["n_slots_touched"] == len({s for e in edges for s in e})
    assert (r["n_components"], r["n_tree"], r["n_unicyclic"]) == (
        nc,
        tree,
        uni,
    )
    assert (r["n_infeasible"], r["keys_in_infeasible"]) == (inf, kinf)
    assert r["max_component_nodes"] == mx
    assert r["table_feasible"] == (inf == 0)


def test_cuckoo_classification_planted():
    """Tree / unicyclic / infeasible classification on planted graphs."""
    # tree: 2 keys on 3 slots (path)
    assert _cuckoo_census([(0, 1), (1, 2)]) == (1, 1, 0, 0, 0, 3)
    # unicyclic: 2 keys on 2 slots (double edge) — feasible
    assert _cuckoo_census([(0, 1), (0, 1)]) == (1, 0, 1, 0, 0, 2)
    # self-loop: 1 key, 1 slot — unicyclic, feasible
    assert _cuckoo_census([(5, 5)]) == (1, 0, 1, 0, 0, 1)
    # infeasible: 3 keys on 2 slots
    assert _cuckoo_census([(0, 1), (0, 1), (0, 1)]) == (
        1,
        0,
        0,
        1,
        3,
        2,
    )
