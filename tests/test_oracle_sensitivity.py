"""Oracle-sensitivity (mutation) pins (r8): the DuckDB value-hash
oracles only gate semantics they can actually SEE. Each case below
mutates one semantic constant on the SPARK side only (the oracle SQL
strings bake the original value at import time) and asserts the gate's
own comparator goes red — proving the differential binds that
parameter rather than vacuously matching. Mutations that the sf0.001
data cannot distinguish (e.g. _STRIP_K 8→9: the duplicated runs are
long, so the covered-position set coincides; _NGRAM_TAU 0.60→0.55: no
pair's Jaccard falls in the gap) are deliberately NOT pinned — a
kill list must only contain kills, or a future legitimate refactor
drowns in false alarms. Both exclusions were re-probed at sf0.01
(r8 continuation): still no kill there, so the insensitivity is a
corpus property (duplicated runs much longer than K; an empty τ
band), not a small-SF artifact."""

from __future__ import annotations

import os
import sys

import pytest

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
sys.path.insert(0, _TOOLS)

import check  # noqa: E402

from copy_databasetables_spark.operators import (  # noqa: E402
    all_oracles,
    all_queries,
)
from copy_databasetables_spark.operators import dedup, similarity, text  # noqa: E402
from tests.conftest import SF_SMOKE

#: (module, constant, mutated value, gated key) — every row verified to
#: KILL on sf0.001 when introduced.
MUTATIONS = [
    (dedup, "_EMBED_TAU", 0.41, "q_dedup_embed"),
    (dedup, "_JACCARD_TAU", 0.90, "q_dedup_near"),
    (dedup, "_EMB_BUCKET_CAP", 1, "q_dedup_embed_recall"),
    (dedup, "_N_BANDS", 2, "q_dedup_lsh_recall"),
    (dedup, "_SUBSTR_K", 7, "q_dedup_substring"),
    (similarity, "_IVF_K", 4, "q_sim_ivf"),
    (similarity, "_K", 4, "q_sim_topk"),
    (text, "_CASC_MIN_TOK", 25, "q_quality_cascade"),
    (text, "_CHUNK", 30, "q_text_chunk"),
    (text, "_FUZZY_D", 3, "q_text_fuzzy_match"),
]


@pytest.fixture(scope="module")
def duck():
    con = check.duck_connect(SF_SMOKE)
    yield con
    con.close()


def _problems(spark, con, key):
    sdf = all_queries()[key](spark, SF_SMOKE).toPandas()
    ddf = con.execute(all_oracles()[key]).df()
    return check.compare(sdf, ddf)


@pytest.mark.parametrize(
    "mod, attr, mutated, key",
    MUTATIONS,
    ids=[f"{m[1]}->{m[3]}" for m in MUTATIONS],
)
def test_oracle_catches_semantic_constant_mutation(spark, duck, mod, attr,
                                                   mutated, key):
    assert _problems(spark, duck, key) == [], "baseline must be green"
    original = getattr(mod, attr)
    assert mutated != original
    setattr(mod, attr, mutated)
    try:
        assert _problems(spark, duck, key) != [], (
            f"oracle for {key} failed to notice {attr} {original}->{mutated}"
        )
    finally:
        setattr(mod, attr, original)
