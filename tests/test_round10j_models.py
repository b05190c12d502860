"""Brute-force Python models for the round-10 wave-10 operators
(effectsize_transport_queries), on the sf0.001 slice."""

import datetime
import hashlib
import math

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.date(1970, 1, 1)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _day_dollars(spark):
    days = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        days[d] = days.get(d, 0) + int(round(float(r["o_totalprice"]) * 100))
    return {d: c // 100 for d, c in days.items()}


def test_sliced_wasserstein_model(spark):
    from hpmr_spark.operators.effectsize_transport_queries import (
        _SW_K,
        sliced_wasserstein_labels,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    by_class = {0: [], 1: []}
    vecs = [
        (
            int(r["label"]) % 2,
            [math.floor(float(x) * 1000000) for x in r["embedding"]],
        )
        for r in rows
    ]
    expect = {}
    for k in range(_SW_K):
        dirs = [(_h60(f"sw:{k}:{d}") % 2) * 2 - 1 for d in range(64)]
        pa = sorted(
            sum(dirs[d] * v[d] for d in range(64)) for y, v in vecs if y == 1
        )
        pb = sorted(
            sum(dirs[d] * v[d] for d in range(64)) for y, v in vecs if y == 0
        )
        na, nb = len(pa), len(pb)
        tot = sum(
            abs(pa[(j + nb - 1) // nb - 1] - pb[(j + na - 1) // na - 1])
            for j in range(1, na * nb + 1)
        )
        expect[k] = (na, nb, tot // (na * nb))
    got = {
        int(r["slice_id"]): (int(r["na"]), int(r["nb"]), int(r["w1_micro"]))
        for r in sliced_wasserstein_labels(spark, SF).collect()
    }
    assert got == expect


def test_hodges_lehmann_model(spark):
    from hpmr_spark.operators.effectsize_transport_queries import (
        hodges_lehmann_location,
    )

    xs = list(_day_dollars(spark).values())
    walsh = sorted(
        xs[i] + xs[j] for i in range(len(xs)) for j in range(i, len(xs))
    )
    t = len(walsh)
    med = walsh[(t + 1) // 2 - 1]
    row = hodges_lehmann_location(spark, SF).collect()[0]
    assert (
        int(row["n_days"]),
        int(row["n_pairs"]),
        int(row["hl_dollar_milli"]),
    ) == (len(xs), t, med * 500)


def test_cliffs_delta_model(spark):
    from hpmr_spark.operators.effectsize_transport_queries import (
        cliffs_delta_effect,
    )

    days = _day_dollars(spark)
    wd = [x for d, x in days.items() if ((d - _EPOCH).days + 3) % 7 < 5]
    we = [x for d, x in days.items() if ((d - _EPOCH).days + 3) % 7 >= 5]
    gt = sum(1 for a in wd for b in we if a > b)
    lt = sum(1 for a in wd for b in we if a < b)
    np_ = len(wd) * len(we)
    num = (gt - lt) * 1000000
    delta = num // np_ if num >= 0 else -((-num) // np_)
    row = cliffs_delta_effect(spark, SF).collect()[0]
    assert (
        int(row["na"]),
        int(row["nb"]),
        int(row["gt"]),
        int(row["lt"]),
        int(row["delta_ppm"]),
    ) == (len(wd), len(we), gt, lt, delta)
