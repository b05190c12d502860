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


# ---------------------------------------- wave B: training dynamics


def _read_emb(spark):
    return [
        (r["vec_id"], r["label"])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    ]


def test_confident_learning_model(spark):
    """Full from-scratch CL replica (Northcutt 2021): thresholds =
    integer mean of self-class scores, gated argmax, confident joint."""
    from hpmr_spark.operators.label_noise_queries import (
        _CL_NCLS,
        confident_learning_noise_census,
    )

    ex = _read_emb(spark)
    lat = {}
    p = {}
    for vid, y in ex:
        t = y if _py_hash60(f"clt:{vid}") % 5 < 4 else (y + 1) % _CL_NCLS
        lat[vid] = t
        for c in range(_CL_NCLS):
            p[(vid, c)] = _py_hash60(f"cl:{vid}:{c}") % 400000 + (
                600000 if c == t else 0
            )
    # thresholds: mean of p_j over examples labeled j (integer floor)
    thr = {}
    for j in range(_CL_NCLS):
        vals = [p[(vid, j)] for vid, y in ex if y == j]
        thr[j] = sum(vals) // len(vals)
    joint = Counter()
    for vid, y in ex:
        gated = [
            (p[(vid, c)], -c) for c in range(_CL_NCLS) if p[(vid, c)] >= thr[c]
        ]
        if not gated:
            continue  # skipped per the paper
        _, negc = max(gated)
        joint[(y, -negc)] += 1
    got = {
        (r["y_noisy"], r["y_pred"]): r["n"]
        for r in confident_learning_noise_census(spark, SF).collect()
    }
    assert len(got) == _CL_NCLS * _CL_NCLS
    for i in range(_CL_NCLS):
        for j in range(_CL_NCLS):
            assert got[(i, j)] == joint.get((i, j), 0)
    # planted ~20% systematic noise is recovered in the off-diagonal
    off = sum(v for (i, j), v in joint.items() if i != j)
    tot = sum(joint.values())
    assert 0.10 < off / tot < 0.30


def test_cartography_and_forgetting_model(spark):
    from hpmr_spark.operators.label_noise_queries import (
        _DC_EPOCHS,
        _DC_VAR_CUT,
        dataset_cartography_map,
        forgetting_events_census,
    )

    ex = _read_emb(spark)
    rows = {}
    fg = Counter()
    fg_detail = defaultdict(Counter)
    for vid, y in ex:
        d = _py_hash60(f"dcd:{vid}") % 3
        ps = []
        for e in range(_DC_EPOCHS):
            q = _py_hash60(f"dc:{vid}:{e}")
            if d == 0:
                ps.append(650000 + q % 300000)
            elif d == 2:
                ps.append(q % 300000)
            else:
                ps.append(q % 1000000)
        s1, s2 = sum(ps), sum(x * x for x in ps)
        conf = s1 // _DC_EPOCHS
        var = _DC_EPOCHS * s2 - s1 * s1
        bits = [1 if x > 500000 else 0 for x in ps]
        nf = sum(
            1
            for i in range(_DC_EPOCHS - 1)
            if bits[i] == 1 and bits[i + 1] == 0
        )
        if var < _DC_VAR_CUT and conf >= 550000:
            region = "easy"
        elif var < _DC_VAR_CUT and conf < 450000:
            region = "hard"
        else:
            region = "ambiguous"
        rows[vid] = (y, conf, var, sum(bits), region)
        n_ok = sum(bits)
        fg_detail[y]["n"] += 1
        if n_ok == 0:
            fg_detail[y]["never"] += 1
        elif nf == 0:
            fg_detail[y]["unforgettable"] += 1
        if nf > 0:
            fg_detail[y]["forgotten"] += 1
        fg_detail[y]["events"] += nf
        fg_detail[y]["mx"] = max(fg_detail[y]["mx"], nf)
    got = {
        r["vec_id"]: (
            r["label"],
            r["conf_ppm"],
            r["var_scaled"],
            r["n_correct"],
            r["region"],
        )
        for r in dataset_cartography_map(spark, SF).collect()
    }
    assert got == rows
    # data-map sanity: easy region's mean confidence beats hard's
    easy = [c for (_, c, _, _, rg) in rows.values() if rg == "easy"]
    hard = [c for (_, c, _, _, rg) in rows.values() if rg == "hard"]
    assert easy and hard
    assert sum(easy) / len(easy) > sum(hard) / len(hard) + 300000
    gotf = {
        r["label"]: r for r in forgetting_events_census(spark, SF).collect()
    }
    for y, d in fg_detail.items():
        r = gotf[y]
        assert r["n_examples"] == d["n"]
        assert r["n_never_learned"] == d["never"]
        assert r["n_unforgettable"] == d["unforgettable"]
        assert r["n_forgotten"] == d["forgotten"]
        assert r["total_forget_events"] == d["events"]
        assert r["max_forgets"] == d["mx"]
        # partition: never + unforgettable + forgotten = examples
        assert d["never"] + d["unforgettable"] + d["forgotten"] == d["n"]


# ------------------------------------------- wave C: dpo / scripting


def test_dpo_margins_model(spark):
    """Independent Python replay of the committed pairing + margins, and
    the planted ~70% policy-boost recovery in the win rate."""
    from hpmr_spark.operators.dpo_queries import dpo_implicit_reward_margins

    docs = sorted(
        (r["lang"], r["doc_id"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "doc_id")
        .collect()
    )
    bylang = defaultdict(list)
    for lang, d in docs:
        bylang[lang].append(d)
    exp = {}
    allm = []
    for lang, ds in bylang.items():
        n_pairs = n_wins = s = 0
        for i in range(0, len(ds) - 1, 2):
            c, r = ds[i], ds[i + 1]
            lp = lambda salt, doc: -(_py_hash60(f"{salt}:{doc}") % 20000000)
            boost = 5000000 if _py_hash60(f"dpob:{c}") % 10 < 7 else 0
            margin = (lp("dpop", c) + boost - lp("dpor", c)) - (
                lp("dpop", r) - lp("dpor", r)
            )
            n_pairs += 1
            n_wins += margin > 0
            s += margin
            allm.append(margin)
        mean = s // n_pairs if s >= 0 else -((-s) // n_pairs)
        exp[lang] = (
            n_pairs,
            n_wins,
            n_wins * 1_000_000 // n_pairs,
            s,
            mean,
        )
    got = {
        r["lang"]: (
            r["n_pairs"],
            r["n_wins"],
            r["win_ppm"],
            r["sum_margin_micro"],
            r["mean_margin_micro"],
        )
        for r in dpo_implicit_reward_margins(spark, SF).collect()
    }
    assert got == exp
    # planted boost: global win rate must sit clearly above coin-flip
    wins = sum(1 for m in allm if m > 0)
    assert 0.60 < wins / len(allm) < 0.95


def test_sql_scripting_isqrt_model(spark):
    """The scripting loop's result equals math.isqrt of the exact cents
    total (the committed ROUND(price*100) rule)."""
    import math

    from hpmr_spark.operators.spark4_surface2_queries import (
        sql_scripting_isqrt_loop,
    )

    total = sum(
        int(
            # Python round() is banker's; replicate SQL HALF_UP via the
            # decimal image of the double (prices are exact cents here,
            # so the two agree — assert that too)
            round(r["o_totalprice"] * 100)
        )
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_totalprice")
        .collect()
    )
    r = sql_scripting_isqrt_loop(spark, SF).collect()[0]
    assert r["total_cents"] == total
    assert r["isqrt_cents"] == math.isqrt(total)
    assert r["isqrt_cents"] ** 2 <= total < (r["isqrt_cents"] + 1) ** 2
