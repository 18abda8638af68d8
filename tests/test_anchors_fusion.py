"""Anchor-text profiles (operators/anchors.py) and noisy-OR triple
confidence fusion (operators/fusion.py)."""

import math

from pyspark.sql import Row

from kg_microbe_spark.operators.anchors import (
    anchor_text_profile,
    extract_anchors,
    top_anchors,
)
from kg_microbe_spark.operators.fusion import fuse_triple_confidence


def _pages(spark):
    return spark.createDataFrame(
        [
            # two links to a.com (one repeat-normalized anchor), one image
            # link (empty anchor -> dropped), attributes on the tag.
            Row(
                doc_id=1,
                html=(
                    '<x><a href="https://www.a.com/p" class="l">  Big   '
                    "Topic </a>"
                    '<a href="https://a.com/q">big topic</a>'
                    '<a href="https://img.net/i.png"><img/></a></x>'
                ),
            ),
            # different page, same domain + anchor (n_pages grows), plus
            # a co.uk target (multi-part suffix) and a second phrase.
            Row(
                doc_id=2,
                html=(
                    '<a href="https://a.com/r">BIG TOPIC</a>'
                    '<a href="http://blog.b.co.uk/x">read more</a>'
                    '<a href="https://a.com/s">other phrase</a>'
                ),
            ),
            Row(doc_id=3, html="<p>no links at all</p>"),
        ]
    )


def test_extract_anchors_normalizes_and_drops_empty(spark):
    rows = extract_anchors(_pages(spark), "doc_id", "html").collect()
    got = {(r.doc_id, r.href, r.anchor) for r in rows}
    assert (1, "https://www.a.com/p", "big topic") in got
    assert (1, "https://a.com/q", "big topic") in got
    assert (2, "http://blog.b.co.uk/x", "read more") in got
    # image link's anchor is empty after the [^<]* capture -> filtered
    assert not any(r.href == "https://img.net/i.png" for r in rows)
    assert len(rows) == 5


def test_anchor_profile_counts_pages_and_mentions(spark):
    prof = {
        (r.dst_domain, r.anchor): (r.n_pages, r.n_mentions)
        for r in anchor_text_profile(_pages(spark), "doc_id", "html").collect()
    }
    # page 1 mentions it twice, page 2 once: 2 pages / 3 mentions
    assert prof[("a.com", "big topic")] == (2, 3)
    assert prof[("a.com", "other phrase")] == (1, 1)
    # eTLD+1 under the frozen suffix list keeps b.co.uk, drops blog.
    assert prof[("b.co.uk", "read more")] == (1, 1)
    assert len(prof) == 3


def test_top_anchors_rank_and_cutoff(spark):
    prof = anchor_text_profile(_pages(spark), "doc_id", "html")
    top1 = {
        r.dst_domain: r.anchor for r in top_anchors(prof, 1).collect()
    }
    assert top1 == {"a.com": "big topic", "b.co.uk": "read more"}


def _triples(spark):
    return spark.createDataFrame(
        [
            # same triple from two sources; src1 extracted twice (max-pool)
            Row(subj="E1", pred="r", obj="V1", source="src1", p=0.6),
            Row(subj="E1", pred="r", obj="V1", source="src1", p=0.9),
            Row(subj="E1", pred="r", obj="V1", source="src2", p=0.5),
            # single-source triple with p=0 -> fused exactly 0.0 (not -0.0)
            Row(subj="E2", pred="r", obj="V2", source="src3", p=0.0),
            # certain witness: clamp keeps ln finite, fused rounds to 1.0
            Row(subj="E3", pred="r", obj="V3", source="src1", p=1.0),
        ]
    )


def test_fusion_noisy_or_max_pools_per_source(spark):
    out = {
        (r.subj, r.obj): r
        for r in fuse_triple_confidence(_triples(spark)).collect()
    }
    e1 = out[("E1", "V1")]
    # max-pool src1 to 0.9 first: 1 - 0.1*0.5 = 0.95 (NOT 1-.4*.1*.5)
    assert e1.n_sources == 2
    assert math.isclose(e1.fused_conf, 0.95, abs_tol=1e-9)
    assert math.isclose(e1.max_p, 0.9, abs_tol=1e-9)
    assert e1.sources == "src1,src2"

    e2 = out[("E2", "V2")]
    assert e2.fused_conf == 0.0 and math.copysign(1, e2.fused_conf) == 1.0
    assert e2.n_sources == 1

    e3 = out[("E3", "V3")]
    assert e3.fused_conf == 1.0  # clamped at 1 - 1e-12, rounds to 1.0


def test_fusion_aggregations_are_partial(spark):
    plan = fuse_triple_confidence(
        _triples(spark)
    )._jdf.queryExecution().executedPlan().toString()
    # both groupBys must show map-side partial aggregation
    assert plan.count("HashAggregate") >= 4
