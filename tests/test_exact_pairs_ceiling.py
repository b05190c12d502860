"""VERDICT r9 item 4: the exact all-pairs baselines refuse O(N²) above the
declared-n ceiling with a routing message, exactly like cosine_pairs_auto
(similarity/lsh.py GEMM_N_CEILING)."""

import pytest

from hpmr_spark.operators.pretrain2_queries import (
    EXACT_PAIRS_N_CEILING,
    bitext_margin_mining,
    hard_negative_mining,
)
from tests.conftest import SF_DIR


@pytest.mark.parametrize("fn", [bitext_margin_mining, hard_negative_mining])
def test_above_ceiling_raises_with_routing(spark, fn):
    with pytest.raises(ValueError) as ei:
        fn(spark, SF_DIR, n_rows=EXACT_PAIRS_N_CEILING + 1)
    msg = str(ei.value)
    assert "EXACT_PAIRS_N_CEILING" in msg
    assert "ivf" in msg.lower()  # routing message names the scale path


def test_below_ceiling_unchanged(spark):
    # declared-n below the ceiling and footer-derived n agree row-for-row
    implicit = {
        (r["query_id"], r["neg_id"]): (r["rank"], r["score_nano"])
        for r in hard_negative_mining(spark, SF_DIR).collect()
    }
    explicit = {
        (r["query_id"], r["neg_id"]): (r["rank"], r["score_nano"])
        for r in hard_negative_mining(spark, SF_DIR, n_rows=500).collect()
    }
    assert implicit == explicit and len(implicit) > 0
