"""ftfy-lite mojibake repair (functions/text.py::fix_mojibake):
fixed-table UTF-8-as-cp1252 double-encoding repair with exact
occurrence counts — pinned against a sequential-str.replace Python
model and the encode/decode round trip that DEFINES the corruption."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from myasynstreamjoin_spark.functions.text import (
    MOJIBAKE_MAP,
    _mojibake,
    fix_mojibake,
)

# repair targets, excluding the NBSP→plain-space normalization (its
# target ' ' would count every ordinary space in count-based asserts)
GOODS = [g for _, g in MOJIBAKE_MAP if g != " "]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def model(text: str):
    n_fixes = 0
    for bad, good in MOJIBAKE_MAP:
        n_fixes += text.count(bad)
        text = text.replace(bad, good)
    return n_fixes, text.count("�"), text


clean_words = st.lists(
    st.sampled_from(["plain", "café", "’", "…", "x"]),
    min_size=0,
    max_size=8,
).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(clean_words, st.booleans(), st.booleans())
def test_matches_model(spark, text, corrupt, add_bad):
    if corrupt:
        text = _mojibake(text)
    if add_bad:
        text = text + "�"
    rows = [(1, text)]
    r = fix_mojibake(_docs(spark, rows)).collect()[0]
    assert (r["n_fixes"], r["n_bad_chars"], r["text_fixed"]) == model(text)


def test_roundtrip_restores_original(spark):
    """fix(mojibake(s)) == s for any text of repairable characters
    (NBSP excepted — it normalizes to a plain space by design)."""
    originals = [
        "café crème — señor “quoted’ … ça",
        "über mañana – fin",
    ]
    rows = [(i, _mojibake(t)) for i, t in enumerate(originals)]
    got = {
        r["doc_id"]: (r["text_fixed"], r["n_fixes"])
        for r in fix_mojibake(_docs(spark, rows)).collect()
    }
    for i, t in enumerate(originals):
        assert got[i][0] == t
        assert got[i][1] == sum(t.count(g) for g in GOODS)


def test_clean_ascii_is_untouched(spark):
    rows = [(1, "perfectly normal ascii text 123")]
    r = fix_mojibake(_docs(spark, rows)).collect()[0]
    assert r["n_fixes"] == 0 and r["n_bad_chars"] == 0
    assert r["text_fixed"] == "perfectly normal ascii text 123"


def test_nbsp_normalizes_to_space(spark):
    rows = [(1, "a" + _mojibake(" ") + "b")]
    r = fix_mojibake(_docs(spark, rows)).collect()[0]
    assert r["text_fixed"] == "a b" and r["n_fixes"] == 1


def test_repair_is_map_only(spark):
    rows = [(1, "x")]
    plan = (
        fix_mojibake(_docs(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
