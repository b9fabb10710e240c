"""Interleaved multimodal record assembly
(functions/multimodal.py::interleave_segments): MMC4/OBELICS-style
text-chunk + image-pointer sequences with packed byte offsets.

Pinned against a brute-force Python model; the zero-exchange (map-only)
plan is locked — assembly is per-doc higher-order functions, so there
is nothing to shuffle."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from myasynstreamjoin_spark.functions.multimodal import interleave_segments

W = 5


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def model(rows, w):
    out = []
    for did, text in rows:
        if text is None:
            continue
        toks = re.split(r"\s+", text.strip().lower())
        n = len(toks)
        n_chunks = max(1, math.ceil(n / w))
        n_imgs = n // w
        segs = []
        for i in range(n_chunks):
            txt = " ".join(toks[i * w : (i + 1) * w])
            segs.append(("text", None, min(w, n - i * w), len(txt.encode())))
            if i < n_imgs:
                segs.append(("image", did * 100 + i, 0, 0))
        off = 0
        for seg_no, (kind, mid, ntok, blen) in enumerate(segs):
            out.append((did, seg_no, kind, mid, ntok, off, blen))
            off += blen
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "é"]), min_size=0, max_size=17
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_matches_model(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    got = sorted(
        tuple(r)
        for r in interleave_segments(_docs(spark, rows), W).collect()
    )
    assert got == model(rows, W)


def test_loader_invariants(spark):
    rows = [(1, " ".join(f"w{i}" for i in range(23))), (2, "a b"), (3, "")]
    segs = interleave_segments(_docs(spark, rows), W).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(segs, key=lambda r: (r["doc_id"], r["seg_no"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, ss in by_doc.items():
        # seg_no dense from 0; offsets are exact prefix sums of byte_len
        assert [s["seg_no"] for s in ss] == list(range(len(ss)))
        off = 0
        for s in ss:
            assert s["byte_offset"] == off
            off += s["byte_len"]
        # image refs carry no bytes/tokens and follow the anchor rule
        imgs = [s for s in ss if s["kind"] == "image"]
        assert all(s["byte_len"] == 0 and s["n_tokens"] == 0 for s in imgs)
        assert [s["media_id"] for s in imgs] == [
            did * 100 + j for j in range(len(imgs))
        ]
    # doc 1: 23 tokens = 5 chunks, 4 full → 4 images
    assert sum(1 for s in by_doc[1] if s["kind"] == "image") == 4
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1


def test_assembly_is_map_only(spark):
    rows = [(i, "a b c d e f g") for i in range(4)]
    plan = (
        interleave_segments(_docs(spark, rows), W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
