"""Kernel-level tests for the HTML/PDF main-content extraction ops
(ocrs_ray/ops/extraction.py). No Ray session required — the batch
functions run directly on pyarrow tables; the full Ray-vs-DuckDB
value comparison lives in the oracle sweep.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocrs_ray.ops import extraction as ex


def _page_for(doc_id=5, text="hello world data", lang="en", source="srcA"):
    batch = pa.table(
        {
            "doc_id": pa.array([doc_id], type=pa.int64()),
            "text": pa.array([text]),
            "lang": pa.array([lang]),
            "source": pa.array([source]),
        }
    )
    return ex._synth_html_arrow(batch).to_pylist()[0]


# ---------------------------------------------------------------------------
# strip_markup


def test_strip_removes_script_style_comment_contents():
    arr = pa.array(
        [
            "<p>keep</p> <script>var secret=1;</script>"
            "<style>p{color:red}</style><!-- hidden -->tail"
        ]
    )
    assert ex.strip_markup(arr).to_pylist() == ["keep tail"]


def test_entity_decode_order_amp_last():
    # &amp;lt; must decode to the literal text "&lt;", never to "<".
    arr = pa.array(["a &amp;lt; b &lt;x&gt; c &amp; d"])
    assert ex.strip_markup(arr).to_pylist() == ["a &lt; b <x> c & d"]


def test_strip_collapses_whitespace_and_trims():
    arr = pa.array(["  <b>a</b>   b\t c  "])
    assert ex.strip_markup(arr).to_pylist() == ["a b c"]


def test_synthetic_page_strip_contains_doc_text():
    page = _page_for(text="alpha beta gamma")
    flat = ex.strip_markup(pa.array([page])).to_pylist()[0]
    assert "alpha beta gamma & more <details> below." in flat
    assert "var docId" not in flat  # script stripped
    assert "font-size" not in flat  # style stripped
    assert "render:" not in flat  # comment stripped


# ---------------------------------------------------------------------------
# link chars / block stats


def test_link_chars_counts_anchor_text_only():
    blk = pa.array(['x <a href="/h">Home y</a> mid <a href="/b">B</a> z'])
    assert ex._link_chars(blk).to_pylist() == [len("Home y") + len("B")]


def test_block_stats_content_block_wins():
    batch = pa.table(
        {
            "doc_id": pa.array([7], type=pa.int64()),
            "text": pa.array(["word " * 24]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s1"]),
        }
    )
    pages = ex._synth_html_arrow(batch)
    stats = ex._block_stats_arrays(pages)
    assert [t for _i, t, *_ in stats] == ["nav", "ad", "content", "footer"]
    scores = {
        tag: tc.to_pylist()[0] * (1_000_000 - d.to_pylist()[0])
        for _i, tag, _f, tc, _lc, d in stats
    }
    assert max(scores, key=scores.get) == "content"
    # nav is pure links: density well above the content block's.
    densities = {tag: d.to_pylist()[0] for _i, tag, _f, _tc, _lc, d in stats}
    assert densities["nav"] > densities["content"]
    assert densities["ad"] > 900_000  # single-anchor block


# ---------------------------------------------------------------------------
# generic nesting-aware segmentation vs the anchored-pattern path


def test_block_segments_matches_pattern_path_on_synthetic_page():
    page = _page_for(doc_id=12, text="one two three")
    segs = ex.html_block_segments(page)
    assert [t for t, _ in segs] == ["nav", "div", "div", "footer"]
    pat_blocks = [
        ex._extract_block(pa.array([page]), pattern, tag).to_pylist()[0]
        for _i, tag, pattern in ex.HTML_BLOCKS
    ]
    assert [inner for _t, inner in segs] == pat_blocks


def test_block_segments_handles_nested_divs():
    html = (
        "<html><body><div class=\"a\">x<div>inner</div>y</div>"
        "<nav>n</nav></body></html>"
    )
    segs = ex.html_block_segments(html)
    assert segs == [("div", "x<div>inner</div>y"), ("nav", "n")]


def test_block_segments_ignores_outside_body():
    html = "<html><head><div>head junk</div></head><body><nav>n</nav></body></html>"
    assert ex.html_block_segments(html) == [("nav", "n")]


def test_block_segments_survives_stray_close_tag():
    # Real crawled markup: a leading </div> must not poison the depth
    # counter for the rest of the document.
    html = (
        "<html><body></div><div>main</div>"
        "<section>x</section></body></html>"
    )
    assert ex.html_block_segments(html) == [("div", "main"), ("section", "x")]


def test_block_segments_self_closing_block():
    # <section/> opens nothing: following siblings stay top-level.
    html = "<html><body><section/><div>d</div></body></html>"
    assert ex.html_block_segments(html) == [("section", ""), ("div", "d")]
    # Nested self-closed block doesn't change depth either.
    html2 = "<html><body><div>a<aside/>b</div><nav>n</nav></body></html>"
    assert ex.html_block_segments(html2) == [
        ("div", "a<aside/>b"),
        ("nav", "n"),
    ]


def test_block_segments_unquoted_attr_trailing_slash_is_open_tag():
    # Per the HTML5 tokenizer an unquoted attribute value consumes up
    # to whitespace/'>', so the '/' in data-href=http://x.com/ is part
    # of the VALUE — the tag opens a block and must be depth-tracked.
    html = (
        "<html><body><div data-href=http://x.com/>main</div>"
        "<nav>n</nav></body></html>"
    )
    assert ex.html_block_segments(html) == [("div", "main"), ("nav", "n")]
    # Quoted value ending in '/' then a real self-close still closes.
    html2 = '<html><body><section data-u="a/"/><div>d</div></body></html>'
    assert ex.html_block_segments(html2) == [("section", ""), ("div", "d")]
    # Whitespace before the slash (<br />-style) self-closes.
    html3 = "<html><body><aside /><div>d</div></body></html>"
    assert ex.html_block_segments(html3) == [("aside", ""), ("div", "d")]


# ---------------------------------------------------------------------------
# markup-safety guard


def test_guard_raises_on_markup_characters():
    with pytest.raises(ValueError, match="markup-significant"):
        ex._guard_markup_safe(pa.array(["safe text", "un<safe"]))


# ---------------------------------------------------------------------------
# PDF content-stream synth + parse


def test_pdf_runs_layout_reading_order_is_chunk_order():
    text = "x" * 200  # 5 chunks
    runs = ex._pdf_runs_for_text(text)
    assert len(runs) == 5
    # (y desc, x asc) sort recovers chunk order i.
    order = sorted(runs, key=lambda r: (-r[2], r[1]))
    assert [r[0] for r in order] == [0, 1, 2, 3, 4]
    assert "".join(r[3] for r in order) == text


def test_pdf_stream_is_shuffled_but_roundtrips():
    import re

    # 6 DISTINCT chunks (periodic text would make the shuffle invisible)
    text = "".join(f"{i:03d}x" for i in range(60))
    stream = ex._pdf_stream_for_text(text)
    runs = re.findall(ex.PDF_RUN_RE, stream, re.ASCII)
    assert len(runs) == 6
    stream_texts = [t for _x, _y, t in runs]
    assert "".join(stream_texts) != text  # genuinely shuffled
    recovered = sorted(
        ((int(x), int(y), t) for x, y, t in runs),
        key=lambda r: (-r[1], r[0]),
    )
    assert "".join(t for _x, _y, t in recovered) == text


def test_pdf_guard_raises_on_oversized_text():
    with pytest.raises(ValueError, match="synthetic single-page layout"):
        ex._pdf_runs_for_text("x" * (ex._PDF_MAX_CHARS + 1))


def test_pdf_guard_raises_on_parentheses():
    # The minimal (...) Tj grammar has no escapes: ')' truncates the
    # run match silently — the guard must be loud instead.
    with pytest.raises(ValueError, match="parentheses"):
        ex._pdf_runs_for_text("(c) 2024 rights reserved")
    with pytest.raises(ValueError, match="parentheses"):
        ex._pdf_runs_for_text("open ( only")


def test_pdf_page_text_keeps_zero_run_docs(ray_session, tmp_path):
    # An empty-text doc synthesizes zero runs; op AND oracle must both
    # keep it as (n_runs=0, page_text='') — previously the oracle's
    # plain GROUP BY dropped the row.
    import duckdb
    import pyarrow.parquet as pq

    from ocrs_ray.ops.extraction import docs_pdf_page_text, pdf_page_text_sql

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["", "hello world"]),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = (
        docs_pdf_page_text(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.execute(pdf_page_text_sql()).df().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_runs"].tolist() == [0, 1]
    assert out["page_text"].tolist() == ["", "hello world"]
    assert exp["doc_id"].tolist() == out["doc_id"].tolist()
    assert exp["n_runs"].tolist() == out["n_runs"].tolist()
    assert exp["page_text"].tolist() == out["page_text"].tolist()


def test_pdf_parse_batch_matches_synth():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["short", "y" * 100]),
        }
    )
    parsed = ex._parse_pdf_batch(batch)
    by_doc = {}
    for d, x, y, t in parsed:
        by_doc.setdefault(d, []).append((x, y, t))
    assert len(by_doc[1]) == 1 and by_doc[1][0][2] == "short"
    assert len(by_doc[2]) == 3


# ---------------------------------------------------------------------------
# checkpoint-resumable pagerank (needs Ray)


def test_pagerank_checkpoint_resume(ray_session, tmp_path):
    import pandas as pd

    from ocrs_ray.ops.extraction import docs_link_pagerank

    sf = "/root/testdata/sf0.001"
    ck = str(tmp_path / "pr_ck")
    fresh = (
        docs_link_pagerank(sf, iters=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # run 2 rounds with checkpointing ("killed" after round 2)
    docs_link_pagerank(sf, iters=2, checkpoint_dir=ck).to_pandas()
    import os

    committed = sorted(d for d in os.listdir(ck) if d.startswith("iter="))
    assert committed == ["iter=0001", "iter=0002"]
    # resume to 4 rounds: rounds 1-2 must be SKIPPED (only 3-4 appear)
    resumed = (
        docs_link_pagerank(sf, iters=4, checkpoint_dir=ck)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    committed = sorted(d for d in os.listdir(ck) if d.startswith("iter="))
    assert committed == ["iter=0001", "iter=0002", "iter=0003", "iter=0004"]
    pd.testing.assert_frame_equal(resumed, fresh)


def test_pagerank_checkpoint_rejects_wrong_corpus(ray_session, tmp_path):
    import pytest as _pytest

    from ocrs_ray.ops.extraction import docs_link_pagerank

    ck = str(tmp_path / "pr_ck2")
    docs_link_pagerank("/root/testdata/sf0.001", iters=1, checkpoint_dir=ck).to_pandas()
    with _pytest.raises(ValueError, match="refusing to resume"):
        docs_link_pagerank("/root/testdata/sf0.1", iters=2, checkpoint_dir=ck)
