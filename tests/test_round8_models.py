"""Brute-force Python models for the round-8 operators: the cross-engine
oracle gate cannot catch a bug in arithmetic or a spec BOTH engines share,
so each committed pipeline is re-derived independently in plain Python on
the sf0.001 slice (CLAUDE.md round-5 rule; same pattern as
test_round7_models.py). The URL model uses urllib.parse — a THIRD parser —
so the canonicalization spec itself is triangulated."""

import hashlib
import math

from pyspark.sql import functions as F


def _hash60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- URL canon


def _py_raw_url(doc_id: int) -> str:
    """Independent Python replica of web_queries' committed synth."""
    pid = doc_id % 97
    hid = pid % 13
    r = {k: _hash60_py(f"url{k}|{doc_id}") % m
         for k, m in [(1, 4), (2, 6), (3, 2), (4, 2), (5, 3), (6, 2)]}
    sch_low = "http" if pid % 2 == 0 else "https"
    sch = sch_low if r[1] % 2 == 0 else sch_low.upper()
    if r[2] >= 4:
        host = f"Site{hid}.Com"
    elif r[2] >= 2:
        host = f"SITE{hid}.COM"
    else:
        host = f"site{hid}.com"
    www = ("WWW." if r[2] >= 2 else "www.") if r[2] % 2 == 1 else ""
    port = (":80" if pid % 2 == 0 else ":443") if r[3] == 1 else ""
    slash = "/" if r[4] == 1 else ""
    path = slash if pid % 10 == 0 else f"/p/{pid}{slash}"
    qa, qb = f"a={pid % 7}", f"b={pid % 5}"
    if pid % 4 == 0:
        query = ""
    elif r[5] == 0:
        query = f"?{qa}&{qb}"
    elif r[5] == 1:
        query = f"?{qb}&{qa}"
    else:
        query = f"?utm_source=feed&{qb}&{qa}"
    frag = f"#sec{pid % 3}" if r[6] == 1 else ""
    return f"{sch}://{www}{host}{port}{path}{query}{frag}"


def _py_canonical(u: str) -> tuple[str, str]:
    """THIRD implementation of the canonicalization spec via urllib."""
    from urllib.parse import urlsplit

    p = urlsplit(u)
    sch = p.scheme.lower()
    host = (p.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    port = ""
    if p.port is not None and not (
        (sch == "http" and p.port == 80) or (sch == "https" and p.port == 443)
    ):
        port = f":{p.port}"
    path = p.path.rstrip("/")
    params = sorted(
        x for x in p.query.split("&") if x and not x.startswith("utm_")
    )
    q = "?" + "&".join(params) if params else ""
    return f"{sch}://{host}{port}{path}{q}", host


def test_url_canonical_model(spark):
    from hpmr_spark.operators.web_queries import url_canonical_dedup_groups

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    groups: dict[str, dict] = {}
    for i in ids:
        canon, host = _py_canonical(_py_raw_url(i))
        g = groups.setdefault(canon, {"host": host, "docs": [], "raws": set()})
        g["docs"].append(i)
        g["raws"].add(_py_raw_url(i))
    got = {
        r["canonical_url"]: r
        for r in url_canonical_dedup_groups(spark, SF).collect()
    }
    assert set(got) == set(groups)
    for canon, g in groups.items():
        row = got[canon]
        assert row["host"] == g["host"], canon
        assert row["n_docs"] == len(g["docs"]), canon
        assert row["n_raw_variants"] == len(g["raws"]), canon
        assert row["keep_doc_id"] == min(g["docs"]), canon


# ------------------------------------------------------ SemDeDup centroids


def test_semdedup_centroid_model(spark):
    """Python replica of the exact integer Lloyd step + centroid-nearest
    prune: seeds by committed hash, integer-L2 assignment (tie → lowest
    cell), truncating per-dim integer mean, τ² int cross-multiplication,
    prune when a (d2c, id)-smaller same-cell neighbor clears τ."""
    from hpmr_spark.operators.dedup_queries import (
        _SEMC_K,
        _SEMC_SALT,
        _SEMC_TAU_SQ_BP,
        semdedup_centroid_prune,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    vi = {
        r["vec_id"]: [math.floor(float(x) * 1_000_000) for x in r["embedding"]]
        for r in rows
    }

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    seeds_order = sorted(
        vi, key=lambda i: (_hash60_py(f"{_SEMC_SALT}{i}"), i)
    )[:_SEMC_K]
    cents = [vi[i] for i in seeds_order]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(cents_):
        return {
            i: min(range(len(cents_)), key=lambda c: (d2(v, cents_[c]), c))
            for i, v in vi.items()
        }

    a1 = assign(cents)
    upd = {}
    for c in range(_SEMC_K):
        members = [vi[i] for i, cc in a1.items() if cc == c]
        if members:
            upd[c] = [
                trunc_div(sum(m[d] for m in members), len(members))
                for d in range(64)
            ]
    cents2 = [upd[c] for c in sorted(upd)]
    a2 = assign(cents2)
    d2c = {i: d2(vi[i], cents2[a2[i]]) for i in vi}
    n2 = {i: sum(x * x for x in v) for i, v in vi.items()}

    pruned = set()
    ids = sorted(vi)
    for x in ids:
        for y in ids:
            if x == y or a2[x] != a2[y]:
                continue
            if (d2c[x], x) >= (d2c[y], y):
                continue
            d = sum(p * q for p, q in zip(vi[x], vi[y]))
            if d > 0 and d * d * 10000 >= _SEMC_TAU_SQ_BP * n2[x] * n2[y]:
                pruned.add(y)

    expect = {}
    for i in vi:
        c = a2[i]
        e = expect.setdefault(c, [0, 0, 0])
        e[0] += 1
        if i in pruned:
            e[1] += 1
        else:
            e[2] += i

    got = {r["cell"]: r for r in semdedup_centroid_prune(spark, SF).collect()}
    assert set(got) == set(expect)
    for c, (nv, np_, ks) in expect.items():
        row = got[c]
        assert (row["n_vectors"], row["n_pruned"], row["kept_id_sum"]) == (
            nv,
            np_,
            ks,
        ), c
