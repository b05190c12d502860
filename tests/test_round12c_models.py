"""Brute-force Python models for the round-12 wave-7 operators
(multi-pattern scan, token pruning, linear-probe census, knapsack), on
the sf0.001 slice plus independent-optimality pins."""

import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

SF = "/root/testdata/sf0.001"


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").collect()


# ------------------------------------------------- multi-pattern scan


def test_multi_pattern_contamination_scan_model(spark):
    from hpmr_spark.operators.corpus_scan2_queries import (
        _MP_NPAT,
        _MP_QMOD,
        multi_pattern_contamination_scan,
    )

    docs = _docs(spark)
    bg = Counter()
    for r in docs:
        if r["doc_id"] % _MP_QMOD:
            continue
        ws = r["text"].split(" ")
        for i in range(len(ws) - 1):
            bg[f"{ws[i]} {ws[i + 1]}"] += 1
    pats = [
        p for p, _ in sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_MP_NPAT]
    exp = {}
    for p in pats:
        hit = occ = 0
        for r in docs:
            n = r["text"].count(p)
            # the committed identity counts NON-OVERLAPPING occurrences
            # exactly like replace() does; str.count is non-overlapping too
            n2 = (len(r["text"]) - len(r["text"].replace(p, ""))) // len(p)
            assert n == n2
            occ += n2
            hit += 1 if n2 else 0
        exp[p] = (hit, occ)
    got = {
        r["pattern"]: (r["docs_hit"], r["occurrences"])
        for r in multi_pattern_contamination_scan(spark, SF).collect()
    }
    assert got == exp and len(got) == _MP_NPAT


# --------------------------------------------------- token pruning


def test_token_pruning_census_model(spark):
    from hpmr_spark.operators.corpus_scan2_queries import (
        _TP_THRESH_NANO,
        token_pruning_census,
    )

    docs = _docs(spark)
    tf = defaultdict(Counter)
    lang = {}
    for r in docs:
        lang[r["doc_id"]] = r["lang"]
        for w in r["text"].split(" "):
            if w:
                tf[r["doc_id"]][w] += 1
    nd = len(docs)
    df = Counter()
    for d in tf.values():
        for w in d:
            df[w] += 1
    idf = {w: math.floor(math.log(nd / c) * 1e9) for w, c in df.items()}
    st = defaultdict(lambda: [0, 0])
    for did, d in tf.items():
        for w, c in d.items():
            st[lang[did]][0] += c
            if c * idf[w] < _TP_THRESH_NANO:
                st[lang[did]][1] += c
    exp = {
        lg: (n, p, p * 1_000_000 // n) for lg, (n, p) in st.items()
    }
    got = {
        r["lang"]: (r["n_tokens"], r["n_prunable"], r["prune_ppm"])
        for r in token_pruning_census(spark, SF).collect()
    }
    assert got == exp
    # non-vacuity: the committed threshold splits, not rubber-stamps
    for n, p, ppm in got.values():
        assert 0 < p < n


# --------------------------------------------- linear probe census


def test_linear_probe_census_model(spark):
    from hpmr_spark.operators.hashtable_sim_queries import (
        _LP_KMOD,
        _LP_M,
        linear_probe_displacement_census,
    )

    keys = sorted(
        {
            r["c_custkey"]
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
            if r["c_custkey"] % _LP_KMOD == 0
        }
    )
    homes = Counter(_py_hash60(f"lp:{k}") % _LP_M for k in keys)
    # carry recurrence, two passes for wraparound
    carry = 0.0
    stats = None
    for p in range(2):
        if p == 1:
            sm = mx = emp = 0
        for s in range(_LP_M):
            carry = max(0.0, carry + homes.get(s, 0) - 1)
            if p == 1:
                sm += carry
                mx = max(mx, carry)
                if homes.get(s, 0) == 0 and (
                    carry == 0
                ):
                    # empty iff nothing homes here and nothing carried IN:
                    # carry-in was the previous carry; since carry-out is 0
                    # only when carry-in + c - 1 <= 0, re-derive carry-in
                    pass
        if p == 1:
            stats = (int(sm), int(mx))
    # recompute empties exactly as committed (c=0 AND carry-IN=0):
    carry = 0.0
    emp = 0
    for p in range(2):
        for s in range(_LP_M):
            cin = carry
            carry = max(0.0, carry + homes.get(s, 0) - 1)
            if p == 1 and homes.get(s, 0) == 0 and cin == 0:
                emp += 1
    r = linear_probe_displacement_census(spark, SF).collect()[0]
    assert (r["table_size"], r["n_keys"]) == (_LP_M, len(keys))
    assert r["load_factor_ppm"] == len(keys) * 1_000_000 // _LP_M
    assert (r["total_displacement"], r["max_cluster_overflow"]) == stats
    assert r["n_empty_slots"] == emp
    # order-independence sanity: occupied slots = M - empties = n_keys
    # (no overflow loss — α < 1)
    assert _LP_M - r["n_empty_slots"] == r["n_keys"]


def test_linear_probe_committed_vs_simulation():
    """The carry recurrence equals an actual insertion simulation's
    order-free stats, on a wrap-heavy synthetic instance."""
    M = 8
    homes = [6, 6, 7, 7, 0, 3]  # wraps past the end
    # simulate real linear probing (any order — use given, then reversed)
    for order in (homes, list(reversed(homes))):
        table = [None] * M
        total_disp = 0
        for h in order:
            s = h
            d = 0
            while table[s] is not None:
                s = (s + 1) % M
                d += 1
            table[s] = h
            total_disp += d
        occupied = {i for i, v in enumerate(table) if v is not None}
        # carry recurrence
        cnt = Counter(homes)
        carry = 0
        sm = 0
        emp = set()
        for p in range(2):
            if p == 1:
                sm = 0
                emp = set()
            for s in range(M):
                cin = carry
                carry = max(0, carry + cnt.get(s, 0) - 1)
                if p == 1:
                    sm += carry
                    if cnt.get(s, 0) == 0 and cin == 0:
                        emp.add(s)
        assert sm == total_disp  # total displacement is order-free
        assert emp == set(range(M)) - occupied


# ----------------------------------------------------------- knapsack


def test_knapsack_source_selection_model(spark):
    from hpmr_spark.operators.budget_knapsack_queries import (
        _KS_UNITS,
        knapsack_source_selection,
    )

    docs = _docs(spark)
    toks = defaultdict(Counter)
    for r in docs:
        for w in r["text"].split(" "):
            if w:
                toks[r["source"]][w] += 1
    srcs = sorted(toks)
    total = sum(sum(c.values()) for c in toks.values())
    items = []
    for rk, s in enumerate(srcs):
        t = sum(toks[s].values())
        w = (t * _KS_UNITS + total - 1) // total
        items.append((1 << rk, w, len(toks[s])))
    # committed DP replica (name-rank fold order, (value, mask) tie-break)
    dp = [0] * (_KS_UNITS + 1)
    mask = [0] * (_KS_UNITS + 1)
    for bit, w, v in items:
        ndp, nmask = dp[:], mask[:]
        for u in range(_KS_UNITS + 1):
            if u >= w:
                cand = dp[u - w] + v
                nm = mask[u - w] + bit
                if cand > dp[u] or (cand == dp[u] and nm < mask[u]):
                    ndp[u], nmask[u] = cand, nm
        dp, mask = ndp, nmask
    got = {
        r["budget_units"]: (r["best_value"], r["subset_mask"], r["subset_size"])
        for r in knapsack_source_selection(spark, SF).collect()
    }
    exp = {
        u: (dp[u], mask[u], bin(mask[u]).count("1"))
        for u in range(_KS_UNITS + 1)
    }
    assert got == exp
    # INDEPENDENT optimality pin: brute-force the full budget's value
    n = len(items)
    best = 0
    for k in range(n + 1):
        for comb in combinations(items, k):
            if sum(w for _, w, _ in comb) <= _KS_UNITS:
                best = max(best, sum(v for _, _, v in comb))
    assert got[_KS_UNITS][0] == best
    # the emitted mask's weight/value must be self-consistent
    for u, (val, m, size) in got.items():
        wsum = sum(w for bit, w, _ in items if m & bit)
        vsum = sum(v for bit, _, v in items if m & bit)
        assert wsum <= u and vsum == val


# ----------------------------------------------------- freshness decay


def test_freshness_decay_weights_model(spark):
    from hpmr_spark.operators.freshness_queries import (
        _FRESH_HALFLIFE_US,
        freshness_decay_weights,
    )
    from hpmr_spark.sources.tables import load_events

    rows = load_events(spark, SF).select("event_type", "ts").collect()
    import datetime

    # exact micros: combine day/second/microsecond fields to avoid float
    # rounding in .timestamp()
    def us_exact(ts):
        epoch = datetime.datetime(1970, 1, 1)
        delta = ts - epoch
        return delta.days * 86400_000_000 + delta.seconds * 1_000_000 + delta.microseconds

    mx = max(us_exact(r["ts"]) for r in rows)
    st = defaultdict(lambda: [0, 0])
    for r in rows:
        age = mx - us_exact(r["ts"])
        w = math.floor(
            math.exp(0.0 - math.log(2.0) * (age / _FRESH_HALFLIFE_US)) * 1e9
        )
        st[r["event_type"]][0] += 1
        st[r["event_type"]][1] += w
    exp = {
        t: (n, m, m * 1_000_000 // (n * 1_000_000_000))
        for t, (n, m) in st.items()
    }
    got = {
        r["event_type"]: (
            r["n_events"], r["decayed_mass_nano"], r["freshness_ppm"]
        )
        for r in freshness_decay_weights(spark, SF).collect()
    }
    assert got == exp and len(got) == 5
    # non-vacuity: decay actually discounts (mass strictly below count·1e9)
    for n, m, ppm in got.values():
        assert 0 < m < n * 1_000_000_000 and 0 < ppm < 1_000_000
