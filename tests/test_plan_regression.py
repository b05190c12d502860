"""Plan-shape regression gate: every query's shuffle count must not exceed
its golden snapshot (plans_golden.json), and broadcast joins must not
silently degrade to shuffle joins. Catches 'correct but 10× more shuffle'
regressions that result-hash checks can't see.

Regenerate intentionally with: python tools/plan_snapshot.py
"""

import json
import os

import pytest

import hpmr_spark.all_queries  # noqa: F401
from hpmr_spark.catalog import QUERIES
from hpmr_spark.plans.explain import has_broadcast_join, n_shuffles

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans_golden.json")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("no plans_golden.json — run tools/plan_snapshot.py")
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_no_shuffle_regressions(spark, sf_dir, golden):
    worse = {}
    for name, expect in golden.items():
        if "error" in expect:
            continue
        df = QUERIES[name](spark, sf_dir)
        got_shuffles = n_shuffles(df)
        if got_shuffles > expect["n_shuffles"]:
            worse[name] = (expect["n_shuffles"], got_shuffles)
        if expect["broadcast_join"] and not has_broadcast_join(df):
            worse[name] = ("broadcast", "lost")
    assert not worse, f"plan regressions: {worse}"


def test_no_codegen_span_loss(spark, sf_dir, golden):
    """Whole-stage codegen must not disappear from any pinned plan (spans
    are measured AQE-off, where the formatted plan carries codegen ids)."""
    from hpmr_spark.plans.explain import whole_stage_codegen_spans

    worse = {}
    orig = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name, expect in golden.items():
            if "error" in expect or expect.get("codegen_spans", 0) == 0:
                continue
            got = whole_stage_codegen_spans(QUERIES[name](spark, sf_dir))
            if got < expect["codegen_spans"]:
                worse[name] = (expect["codegen_spans"], got)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", orig)
    assert not worse, f"codegen span loss: {worse}"
