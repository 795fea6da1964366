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
# nested-markup main content (depth-tracking scanner as production path)


def test_nested_scanner_keeps_tail_after_inner_div():
    import re as _re

    batch = pa.table(
        {
            "doc_id": pa.array([3], type=pa.int64()),
            "text": pa.array(["alpha beta gamma"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s0"]),
        }
    )
    page = ex._render_template_arrow(batch, ex._NESTED_PAGE_TEMPLATE)[0].as_py()
    segs = ex.html_block_segments(page)
    assert [t for t, _ in segs] == ["nav", "div", "footer"]
    body = segs[1][1]
    # The tail paragraph sits AFTER the nested inner div: a non-greedy
    # pattern split stops at the inner </div> and silently drops it.
    assert "Tail from s0." in body
    naive = _re.search(r'<div class="body">(.*?)</div>', page).group(1)
    assert "Tail from" not in naive


def test_html_nested_main_content_matches_oracle(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from ocrs_ray.ops.extraction import (
        docs_html_nested_main_content,
        html_nested_main_content_sql,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 7, 12], type=pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta words here",
                        "x",
                        "longer body text " * 10,
                        "",
                    ]
                ),
                "lang": pa.array(["en", "de", "en", "fr"]),
                "source": pa.array(["s0", "s1", "s2", "s3"]),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = (
        docs_html_nested_main_content(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.execute(html_nested_main_content_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # the long-text body must win for doc 7 and carry the tail
    row7 = out[out.doc_id == 7].iloc[0]
    assert row7.main_tag == "div" and "Tail from s2." in row7.main_text


# ---------------------------------------------------------------------------
# newspaper-column PDF layout (column detection required)


def test_pdf_column_layout_row_major_order_is_wrong():
    # 5 distinct chunks -> rpc=3: col 0 holds chunks 0-2, col 1 holds
    # 3-4. Column order (x asc, y desc) recovers the text; the zigzag
    # ops' row-major sort (y desc, x asc) interleaves the columns.
    text = "".join(f"{i:040d}" for i in range(5))
    runs = ex._pdf_column_runs_for_text(text)
    assert len(runs) == 5
    assert sorted({r[1] for r in runs}) == [72, 312]
    col_order = sorted(runs, key=lambda r: (r[1], -r[2]))
    assert [r[0] for r in col_order] == [0, 1, 2, 3, 4]
    assert "".join(r[3] for r in col_order) == text
    row_major = sorted(runs, key=lambda r: (-r[2], r[1]))
    assert [r[0] for r in row_major] == [0, 3, 1, 4, 2]
    assert "".join(r[3] for r in row_major) != text


def test_pdf_column_runs_edge_sizes():
    # n=1 -> one column; n=2 -> rpc=1, one chunk per column (both at
    # y=720, where row-major order coincides); empty -> no runs.
    assert ex._pdf_column_runs_for_text("") == []
    one = ex._pdf_column_runs_for_text("a" * 30)
    assert [(r[1], r[2]) for r in one] == [(72, 720)]
    two = ex._pdf_column_runs_for_text("b" * 80)
    assert [(r[1], r[2]) for r in two] == [(72, 720), (312, 720)]
    # max-size text keeps every y positive
    full = ex._pdf_column_runs_for_text("c" * ex._PDF_MAX_CHARS)
    assert min(r[2] for r in full) > 0
    with pytest.raises(ValueError, match="synthetic single-page layout"):
        ex._pdf_column_runs_for_text("x" * (ex._PDF_MAX_CHARS + 1))
    with pytest.raises(ValueError, match="parentheses"):
        ex._pdf_column_runs_for_text("see (note)")


def test_pdf_column_text_matches_oracle(ray_session, tmp_path):
    # Op vs SQL oracle on edge sizes: empty (0 cols), single-chunk
    # (1 col), and a 5-distinct-chunk doc where row-major order would
    # corrupt the text (2 cols) — exact round-trip certifies the
    # column detection.
    import duckdb
    import pyarrow.parquet as pq

    from ocrs_ray.ops.extraction import (
        docs_pdf_column_text,
        pdf_column_text_sql,
    )

    five = "".join(f"{i:040d}" for i in range(5))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(["", "hello world", five]),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = (
        docs_pdf_column_text(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.execute(pdf_column_text_sql()).df().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_cols"].tolist() == [0, 1, 2]
    assert out["page_text"].tolist() == ["", "hello world", five]
    assert exp["n_cols"].tolist() == out["n_cols"].tolist()
    assert exp["page_text"].tolist() == out["page_text"].tolist()


# ---------------------------------------------------------------------------
# HTML table extraction (ragged per-doc structure)


def test_table_templates_render_ragged_rows():
    import re as _re

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 5], type=pa.int64()),
            "text": pa.array(["a", "b", "c"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0"] * 3),
        }
    )
    tr_re = _re.compile(ex.HTML_TR_RE, _re.ASCII)
    t3 = ex._render_template_arrow(batch, ex._table_page_template(3))
    rows = tr_re.findall(t3[2].as_py())  # doc 5 page with 3 rows
    # cell values are (doc_id * r) % 97 per row r
    assert rows == [("k1", "5"), ("k2", "10"), ("k3", "15")]
    t1 = ex._render_template_arrow(batch, ex._table_page_template(1))
    assert tr_re.findall(t1[0].as_py()) == [("k1", "0")]


def test_html_table_extract_matches_oracle(ray_session, tmp_path):
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from ocrs_ray.ops.extraction import (
        docs_html_table_extract,
        html_table_extract_sql,
    )

    n = 9
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array([f"w{i} salad" for i in range(n)]),
                "lang": pa.array(["en"] * n),
                "source": pa.array([f"s{i % 3}" for i in range(n)]),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = (
        docs_html_table_extract(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "row_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.execute(html_table_extract_sql())
        .df()
        .sort_values(["doc_id", "row_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # ragged: doc_id % 3 + 1 rows per doc
    assert out.groupby("doc_id").size().tolist() == [1, 2, 3] * 3


# ---------------------------------------------------------------------------
# multi-page PDF (pagination removes the single-page length cap)


def test_pdf_multipage_stream_paginates_and_roundtrips():
    import re as _re

    run_re = _re.compile(ex.PDF_RUN_RE, _re.ASCII)
    # 5000 chars > the single-page ops' 4160-char guard: 125 chunks
    # over 3 pages (50 + 50 + 25)
    text = "x" * 5000
    with pytest.raises(ValueError):
        ex._pdf_runs_for_text(text * 0 + "y" * (ex._PDF_MAX_CHARS + 1))
    stream = ex._pdf_multipage_stream_for_text(text)
    pages = stream.split(ex.PDF_PAGE_SEP)
    assert len(pages) == 3
    assert [len(run_re.findall(p)) for p in pages] == [50, 50, 25]
    got = "".join(
        "".join(
            rt
            for _y, rt in sorted(
                ((int(y), rt) for _x, y, rt in run_re.findall(p)),
                key=lambda r: -r[0],
            )
        )
        for p in pages
    )
    assert got == text
    assert ex._pdf_multipage_stream_for_text("") == ""
    with pytest.raises(ValueError, match="parentheses"):
        ex._pdf_multipage_stream_for_text("bad (stream)")


def test_pdf_multipage_text_matches_oracle(ray_session, tmp_path):
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from ocrs_ray.ops.extraction import (
        docs_pdf_multipage_text,
        pdf_multipage_text_sql,
    )

    texts = ["", "short one", "word " * 500, "x" * 5000]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = (
        docs_pdf_multipage_text(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "page_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.execute(pdf_multipage_text_sql())
        .df()
        .sort_values(["doc_id", "page_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # zero-chunk doc emits no rows; the 5000-char doc spans 3 pages
    assert 0 not in set(out.doc_id)
    assert out[out.doc_id == 3].page_idx.tolist() == [0, 1, 2]
    whole = "".join(out[out.doc_id == 3].page_text)
    assert whole == "x" * 5000


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


def test_pagerank_npart_invariant(ray_session, tmp_path):
    """Bucket count must not change values: npart >> nodes forces the
    sentinel-only / empty-bucket paths (most buckets have no nodes, so
    many exchange blocks are sentinel rows only), npart=2 packs many
    buckets per block — both must agree with the default exactly.
    npart=16 (not 64): at the 4-CPU test budget a 64-partition hash
    exchange demands more aggregator CPUs than the session owns and
    the test crawls (the hash_shuffle.py:1217 'Limited available CPU'
    warning); 16 partitions over 12 docs still leaves >= 4 empty
    buckets while keeping the standard 2-aggregator footprint."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ocrs_ray.ops.extraction import docs_link_pagerank

    n = 12
    texts = [f"w{i} " * 6 for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n, type=pa.string()),
                "source": pa.array(["s0"] * n, type=pa.string()),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
        row_group_size=4,
    )
    sf = str(tmp_path)

    def run(**kw):
        return (
            docs_link_pagerank(sf, iters=3, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    base = run()
    assert len(base) == n
    pd.testing.assert_frame_equal(run(npart=16), base)
    pd.testing.assert_frame_equal(run(npart=2), base)


def test_pagerank_checkpoint_rejects_wrong_corpus(ray_session, tmp_path):
    import pytest as _pytest

    from ocrs_ray.ops.extraction import docs_link_pagerank

    ck = str(tmp_path / "pr_ck2")
    docs_link_pagerank("/root/testdata/sf0.001", iters=1, checkpoint_dir=ck).to_pandas()
    with _pytest.raises(ValueError, match="refusing to resume"):
        docs_link_pagerank("/root/testdata/sf0.1", iters=2, checkpoint_dir=ck)


def test_pagerank_checkpoint_legacy_manifest_message(ray_session, tmp_path):
    """A manifest written before the npart guard (no 'npart' key) must
    fail with the explicit 'predates the npart guard' message, not a
    confusing npart=None mismatch (ADVICE r04)."""
    import json

    import pytest as _pytest

    from ocrs_ray.ops.extraction import docs_link_pagerank

    ck = str(tmp_path / "pr_ck3")
    docs_link_pagerank(
        "/root/testdata/sf0.001", iters=1, checkpoint_dir=ck
    ).to_pandas()
    mf = f"{ck}/manifest.json"
    with open(mf) as f:
        saved = json.load(f)
    del saved["npart"]
    with open(mf, "w") as f:
        json.dump(saved, f)
    with _pytest.raises(ValueError, match="predates the npart guard"):
        docs_link_pagerank(
            "/root/testdata/sf0.001", iters=2, checkpoint_dir=ck
        )


def test_anti_join_uncrawled_empty_corpus_message(ray_session, tmp_path):
    """frontier_new_urls on an empty documents table must raise the
    explicit empty-corpus error, not TypeError from None + 1
    (ADVICE r04)."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from ocrs_ray.ops.extraction import frontier_new_urls

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    with _pytest.raises(ValueError, match="empty"):
        frontier_new_urls(str(tmp_path))


# ---------------------------------------------------------------------------
# link-graph degree / anchor analytics (needs Ray)


def test_link_degree_structure(ray_session):
    """Chain edges are mutual, /ref/ hub edges are one-way: every
    mid-chain doc has reciprocal_degree == 2 (prev+next), the two
    chain ends 1, and hub in-degree dwarfs the chain's 2."""
    from ocrs_ray.ops.extraction import docs_link_degree

    out = (
        docs_link_degree("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = len(out)
    assert out.doc_id.tolist() == list(range(n))  # every doc has a row
    mid = out.iloc[1:-1]
    assert (mid.reciprocal_degree == 2).all()
    assert out.iloc[0].reciprocal_degree == 1
    assert out.iloc[-1].reciprocal_degree == 1
    # hubs: docs 1..12 collect a /ref/ edge from every 13th doc
    # (doc 0's /ref/0 self-loop is dropped, so its in-degree is lower)
    hub = out[(out.doc_id >= 1) & (out.doc_id <= 12)]
    assert (hub.in_degree > 2 + n // 26).all()
    rest = out[out.doc_id > 12]
    assert (rest.in_degree <= 2).all()


def test_link_degree_npart_invariant(ray_session):
    import pandas as pd

    from ocrs_ray.ops.extraction import docs_link_degree

    sf = "/root/testdata/sf0.001"
    base = (
        docs_link_degree(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for npart in (2, 16):
        alt = (
            docs_link_degree(sf, npart=npart)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(alt, base)


def test_link_anchor_profile_topk_and_counts(ray_session):
    """top_anchors is the k smallest (anchor, src) pairs '|'-joined;
    in_degree counts ALL occurrences (not just the k kept). k=2 on a
    hub forces the combiner's truncation path."""
    from ocrs_ray.ops.extraction import docs_link_anchor_profile

    out = (
        docs_link_anchor_profile("/root/testdata/sf0.001", k=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 5 (hub): anchors sort as "Next doc" < "Prev doc" < "[5]"...
    assert out.loc[5, "top_anchors"] == "Next doc|Prev doc"
    assert out.loc[5, "in_degree"] > 2  # ...but the count keeps them all
    # non-hub doc: exactly the two chain anchors
    assert out.loc[20, "top_anchors"] == "Next doc|Prev doc"
    assert out.loc[20, "in_degree"] == 2


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-frontier raw URL stream)


def test_url_norm_steps_kernel_parity():
    """The ordered step list renders identically through RE2 kernels
    and DuckDB regexp_replace — checked on hand-picked dirty URLs
    covering every rule (fragment, utm, dot-segment, slash runs,
    shouting host, trailing slash)."""
    import duckdb

    raws = [
        "/doc/7/../8/index.html#sec3",
        "HTTP://EX.com//p4//q/",
        "/ref/9?utm_source=feed&utm_medium=s1&ref=2",
        "/plain/path",
        "/only-utm?utm_a=x",
        "/frag#a#b",
    ]
    got = ex.normalize_urls(pa.array(raws)).to_pylist()
    con = duckdb.connect()
    expr = ex.normalize_urls_sql("u")
    exp = [
        con.execute(f"SELECT {expr} FROM (VALUES (?)) t(u)", [r]).fetchone()[0]
        for r in raws
    ]
    assert got == exp
    assert got[0] == "/doc/8/index.html"
    assert got[1] == "http://ex.com/p4/q"
    assert got[2] == "/ref/9?ref=2"
    assert got[3] == "/plain/path"
    assert got[4] == "/only-utm"
    assert got[5] == "/frag"


def test_url_normalize_matches_oracle(ray_session):
    import duckdb
    import pandas as pd

    from ocrs_ray.ops.extraction import docs_url_normalize, url_normalize_sql

    sf = "/root/testdata/sf0.001"
    out = (
        docs_url_normalize(sf)
        .to_pandas()
        .sort_values(["doc_id", "url_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = (
        con.execute(url_normalize_sql())
        .df()
        .sort_values(["doc_id", "url_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_url_canonical_groups_structure(ray_session):
    """v0 URLs stay per-doc, v1 collapses onto 13 canonical targets,
    v2 onto <= 91 — the frontier-dedup win the op exists for."""
    from ocrs_ray.ops.extraction import docs_url_canonical_groups

    out = docs_url_canonical_groups("/root/testdata/sf0.001").to_pandas()
    n_docs = int(out.n_refs.sum()) // 3
    v1 = out[out.href_norm.str.startswith("http://ex.com/")]
    assert len(v1) == 13
    assert int(v1.n_refs.sum()) == n_docs
    v2 = out[out.href_norm.str.startswith("/ref/")]
    assert len(v2) <= 91
    assert int(v2.n_refs.sum()) == n_docs
    v0 = out[out.href_norm.str.startswith("/doc/")]
    assert (v0.n_refs == 1).all() and len(v0) == n_docs


def test_robots_policy_filter_semantics(ray_session):
    """k%3==0 sources lose their /ref/ URLs, k%3==1 lose /doc/,
    k%3==2 keep everything; the absolute ex.com URL is always
    allowed."""
    import pandas as pd

    from ocrs_ray.ops.extraction import docs_robots_policy_filter

    sf = "/root/testdata/sf0.001"
    out = docs_robots_policy_filter(sf).to_pandas()
    src = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "source"]
    )
    j = out.merge(src, on="doc_id")
    k = j.source.str[3:].astype(int)
    assert (j[j.href_norm.str.startswith("http://ex.com/")].allowed).all()
    ref = j[j.href_norm.str.startswith("/ref/")]
    assert (ref.allowed == (k[ref.index] % 3 != 0)).all()
    doc = j[j.href_norm.str.startswith("/doc/")]
    assert (doc.allowed == (k[doc.index] % 3 != 1)).all()
    assert not out.allowed.all() and out.allowed.any()


def test_source_crawl_budget_totals(ray_session):
    """Budget rows sum to 3 URLs/doc, and n_allowed+n_disallowed
    partitions them; k%3==2 sources have zero disallowed."""
    from ocrs_ray.ops.extraction import source_crawl_budget

    out = source_crawl_budget("/root/testdata/sf0.001").to_pandas()
    assert (out.n_urls == out.n_allowed + out.n_disallowed).all()
    assert int(out.n_urls.sum()) == 3 * 500
    k = out.source.str[3:].astype(int)
    assert (out[k % 3 == 2].n_disallowed == 0).all()
    assert (out[k % 3 != 2].n_disallowed > 0).all()


def test_html_outline_structure(ray_session):
    """Per-doc outline: one h1 first, doc_id%3+1 h2 sections in
    order, and exactly the 3-section docs carry a trailing h3."""
    from ocrs_ray.ops.extraction import docs_html_outline

    out = docs_html_outline("/root/testdata/sf0.001").to_pandas()
    g = out.sort_values(["doc_id", "heading_idx"]).groupby("doc_id")
    for d, rows in g:
        levels = rows.level.tolist()
        n_sec = d % 3 + 1
        exp = [1] + [2] * n_sec + ([3] if n_sec == 3 else [])
        assert levels == exp, (d, levels)
        assert rows.heading.iloc[0] == f"Doc {d}"
        assert rows.heading.iloc[1].startswith("Part 1 of ")


def test_crawl_schedule_prep_composition(ray_session):
    """The composed queue equals robots-filter + frontier logic done
    by hand on the flat stream: survivors are allowed, uncrawled
    canonical targets; every ex.com hub and every crawled-half target
    is gone."""
    import pandas as pd

    from ocrs_ray.ops.extraction import (
        crawl_schedule_prep,
        docs_robots_policy_filter,
    )

    sf = "/root/testdata/sf0.001"
    out = crawl_schedule_prep(sf).to_pandas()
    lab = docs_robots_policy_filter(sf).to_pandas()
    cut = (lab.doc_id.max() + 1) // 2
    allowed = lab[lab.allowed]
    seen = set(allowed[allowed.doc_id < cut].href_norm)
    exp = (
        allowed[~allowed.href_norm.isin(seen)]
        .groupby("href_norm")
        .agg(n_refs=("doc_id", "size"), first_doc=("doc_id", "min"))
        .reset_index()
    )
    got = out.sort_values("href_norm").reset_index(drop=True)
    exp = exp.sort_values("href_norm").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    assert len(got) > 0
    assert not got.href_norm.str.startswith("http://ex.com/").any()


def test_pdf_hyphen_runs_kernel():
    """Straddle rule: a hyphen appears exactly where a 40-char chunk
    boundary splits a word; a boundary on either side of a space gets
    none. A literal '-' in the text raises loudly."""
    import pytest

    w = ex.PDF_CHUNK
    # boundary splits 'xy': chunk 0 ends 'x', chunk 1 starts 'y'
    t = "a" * (w - 1) + "xy plus tail"
    runs = ex._pdf_hyphen_runs_for_text(t)
    assert runs[0][3].endswith("x-")
    # boundary right after a space: no hyphen
    t2 = "b" * (w - 1) + " next chunk here"
    assert not ex._pdf_hyphen_runs_for_text(t2)[0][3].endswith("-")
    # boundary right before a space: no hyphen
    t3 = "c" * w + " starts with space"
    assert not ex._pdf_hyphen_runs_for_text(t3)[0][3].endswith("-")
    with pytest.raises(ValueError, match="literal '-'"):
        ex._pdf_hyphen_runs_for_text("has a - dash")


def test_pdf_dehyphenated_roundtrip(ray_session):
    """Dehyphenation undoes every break hyphen: page_text equals the
    source text byte-for-byte, and at least one doc actually carried
    hyphens (non-degeneracy)."""
    import pandas as pd

    from ocrs_ray.ops.extraction import docs_pdf_dehyphenated_text

    sf = "/root/testdata/sf0.001"
    out = docs_pdf_dehyphenated_text(sf).to_pandas().set_index("doc_id")
    src = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).set_index("doc_id")
    assert int(out.n_hyphens.sum()) > 0
    joined = out.join(src)
    assert (joined.page_text == joined.text).all()


def test_boilerplate_classify_labels(ray_session):
    """nav/ad are always link-dense boilerplate; the content block
    splits content/short on the doc's own text length — all three
    labels occur at sf0.001 (threshold non-degeneracy guard)."""
    from ocrs_ray.ops.extraction import docs_block_boilerplate_classify

    out = docs_block_boilerplate_classify("/root/testdata/sf0.001").to_pandas()
    assert set(out[out.tag.isin(["nav", "ad"])].label) == {"boilerplate"}
    content = out[out.tag == "content"]
    assert {"content", "short"} <= set(content.label)
    assert (
        content.label.eq("short") == (content.text_chars < 200)
    ).all()


def test_boilerplate_filtered_text_vs_main_content(ray_session):
    """FILTER vs PICK: where the content block passes both gates the
    filtered text equals the main-content winner's text; where it is
    short the filter honestly emits '' while the pick still returns a
    winner."""
    import pandas as pd

    from ocrs_ray.ops.extraction import (
        docs_boilerplate_filtered_text,
        docs_html_main_content,
    )

    sf = "/root/testdata/sf0.001"
    filt = docs_boilerplate_filtered_text(sf).to_pandas().set_index("doc_id")
    pick = docs_html_main_content(sf).to_pandas().set_index("doc_id")
    kept = filt[filt.kept_blocks == 1]
    assert len(kept) > 0
    pd.testing.assert_series_equal(
        kept.extracted_text,
        pick.loc[kept.index, "main_text"],
        check_names=False,
    )
    empty = filt[filt.kept_blocks == 0]
    assert len(empty) > 0
    assert (empty.extracted_text == "").all()
    assert (empty.n_chars == 0).all()


def test_frontier_new_urls_matches_oracle(ray_session):
    """The anti-join diff equals the SQL NOT IN oracle, and every
    survivor is a per-doc v0 page — the v1/v2 hub targets are all
    seen by the crawled half, so nothing shared survives."""
    import duckdb
    import pandas as pd

    from ocrs_ray.ops.extraction import (
        frontier_new_urls,
        frontier_new_urls_sql,
    )

    sf = "/root/testdata/sf0.001"
    out = (
        frontier_new_urls(sf)
        .to_pandas()
        .sort_values("href_norm")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = (
        con.execute(frontier_new_urls_sql())
        .df()
        .sort_values("href_norm")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[exp.columns], exp, check_dtype=False
    )
    assert len(out) > 0
    assert out.href_norm.str.startswith("/doc/").all()
