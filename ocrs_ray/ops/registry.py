"""Registry wiring training-data operators into the driver contract.

Each entry pairs a Ray pipeline with (where SQL-expressible) a DuckDB
oracle over the pre-registered views. Float-summing aggregates are
carried as integer micro-units on both sides so value hashes compare
exactly; sketch/heuristic ops (minhash, simhash, LSH ANN, lang-id,
winnowing) are rows-only for the driver and verified against exact
reference implementations in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from . import analytics, composed, dedup, extraction, relational, sampling, similarity, sketch, sources, text, tpch

_STOP_LIST = ", ".join(f"'{w}'" for w in text.STOPWORDS)

#: Shared CTE body producing exact word-3-gram Jaccard >= 0.8 pairs
#: (doc_a < doc_b) — used by both the pair oracle and the recursive
#: connected-components oracle.
_NGRAM_PAIRS_CTE = (
    r"sh AS (SELECT doc_id, list_distinct("
    r"CASE WHEN length(regexp_extract_all(text, '\S+')) = 0 THEN [] "
    r"WHEN length(regexp_extract_all(text, '\S+')) < 3 "
    r"THEN [array_to_string(regexp_extract_all(text, '\S+'), ' ')] "
    r"ELSE list_transform(range(1, length(regexp_extract_all(text, '\S+')) - 1), "
    r"i -> regexp_extract_all(text, '\S+')[i] || ' ' || "
    r"regexp_extract_all(text, '\S+')[i+1] || ' ' || "
    r"regexp_extract_all(text, '\S+')[i+2]) END) AS sset FROM documents), "
    "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "length(list_intersect(a.sset, b.sset)) AS inter, "
    "length(a.sset) + length(b.sset) - length(list_intersect(a.sset, b.sset)) AS uni "
    "FROM sh a JOIN sh b ON a.doc_id < b.doc_id)"
)

_MD5_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
)


def _repeated_substring_sql(k: int = 32, stride: int = 8) -> str:
    """repeated_substring_pairs oracle: k-char grams at `stride`
    (1-based positions), self-joined on the exact substring; the pair
    row counts occurrence pairs and carries each side's first matching
    position — bit-exact against the Ray partial/combine aggregation."""
    return (
        f"WITH g AS (SELECT doc_id, unnest(list_transform(range(0, "
        f"greatest((length(text) - {k}) // {stride} + 1, 0)), "
        f"j -> 1 + j * {stride})) AS pos, text FROM documents "
        f"WHERE length(text) >= {k}), "
        f"gg AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
        f"substr(text, CAST(pos AS INTEGER), {k}) AS gram FROM g) "
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"CAST(count(*) AS BIGINT) AS n_shared_grams, "
        f"CAST(min(a.pos) AS BIGINT) AS first_pos_a, "
        f"CAST(min(b.pos) AS BIGINT) AS first_pos_b "
        f"FROM gg a JOIN gg b USING (gram) WHERE a.doc_id < b.doc_id "
        f"GROUP BY 1, 2"
    )


def _substring_clusters_sql(k: int = 32, stride: int = 8, min_shared: int = 2) -> str:
    """substring_dup_clusters oracle: the repeated-substring pair CTE
    filtered at min_shared, symmetrized, then min-reachable-source over
    the recursive closure (same convention as the dedup_clusters
    oracle)."""
    return (
        f"WITH RECURSIVE g AS (SELECT doc_id, unnest(list_transform(range(0, "
        f"greatest((length(text) - {k}) // {stride} + 1, 0)), "
        f"j -> 1 + j * {stride})) AS pos, text FROM documents "
        f"WHERE length(text) >= {k}), "
        f"gg AS (SELECT doc_id, substr(text, CAST(pos AS INTEGER), {k}) "
        f"AS gram FROM g), "
        f"p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM gg a "
        f"JOIN gg b USING (gram) WHERE a.doc_id < b.doc_id "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_shared}), "
        f"edges AS (SELECT doc_a AS u, doc_b AS v FROM p "
        f"UNION ALL SELECT doc_b, doc_a FROM p), "
        f"reach(src, node) AS (SELECT doc_id, doc_id FROM documents "
        f"UNION SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u) "
        f"SELECT node AS doc_id, CAST(min(src) AS BIGINT) AS cluster_id "
        f"FROM reach GROUP BY node"
    )


_SIMHASH_CTE = (
    "toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
    f" '{text.TOKEN_CLASS_RE}')) AS tok FROM documents), "
    "th AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 16)) "
    "AS UBIGINT) AS th FROM toks), "
    "votes AS (SELECT doc_id, i, sum(CASE WHEN (th >> CAST(i AS "
    "UTINYINT)) & 1 = 1 THEN 1 ELSE -1 END) AS v "
    "FROM th CROSS JOIN range(64) r(i) GROUP BY doc_id, i), "
    "agg AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN "
    "(CAST(1 AS HUGEINT) << CAST(i AS INTEGER)) ELSE "
    "CAST(0 AS HUGEINT) END) AS val FROM votes GROUP BY doc_id), "
    "sh AS (SELECT d.doc_id, CAST(coalesce(a.val, 0) AS UBIGINT) AS h "
    "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id)"
)


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """simhash_neardup_pairs oracle: exact hamming distance over the
    same md5-token-vote fingerprints the op computes (xor + bit_count),
    all pairs at distance <= max_hamming."""
    return (
        f"WITH {_SIMHASH_CTE} "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming "
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}"
    )


def _source_distinct_shingles_sql(k: int = 3) -> str:
    """source_distinct_shingles oracle: word k-grams (TOKEN_CLASS_RE
    tokens, stride 1), exact COUNT(DISTINCT shingle) per source —
    the op computes this without the hot-key shuffle via value-salted
    disjoint buckets; the oracle states the plain definition."""
    concat = " || ' ' || ".join(f"w[j+{i + 1}]" for i in range(k))
    return (
        "WITH toks AS (SELECT source, regexp_extract_all(text, "
        f"'{text.TOKEN_CLASS_RE}') AS w FROM documents), "
        f"g AS (SELECT source, unnest(list_transform(range(0, "
        f"greatest(length(w) - {k - 1}, 0)), j -> {concat})) AS shingle "
        "FROM toks) "
        "SELECT source, CAST(count(DISTINCT shingle) AS BIGINT) "
        "AS n_distinct_shingles FROM g GROUP BY source"
    )


def _dup_gram_fraction_sql(n: int = 5) -> str:
    """docs_dup_gram_fraction oracle: word n-grams (whitespace tokens,
    stride 1), a gram is duplicated when it occurs in >= 2 distinct
    docs; per-doc duplicated-position share as floor ppm, zero-gram
    docs kept with zeros via the LEFT JOIN."""
    concat = " || ' ' || ".join(f"w[j+{i + 1}]" for i in range(n))
    return (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(text, "
        f"'{text.TOKEN_CLASS_RE}') AS w "
        "FROM documents), "
        f"g AS (SELECT doc_id, unnest(list_transform(range(0, "
        f"greatest(length(w) - {n - 1}, 0)), j -> {concat})) AS gram FROM toks), "
        "nd AS (SELECT gram, count(DISTINCT doc_id) AS ndocs FROM g GROUP BY gram), "
        "per AS (SELECT g.doc_id, count(*) AS n_grams, "
        "sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup "
        "FROM g JOIN nd USING (gram) GROUP BY g.doc_id) "
        "SELECT d.doc_id, CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams, "
        "CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_grams, "
        "CAST(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0 "
        "ELSE (1000000 * per.n_dup) // per.n_grams END AS BIGINT) AS dup_ppm "
        "FROM documents d LEFT JOIN per USING (doc_id)"
    )


def _lang_id_sql() -> str:
    """lang_id oracle, generated from the same _LANG_STOPWORDS tables
    the op uses (no drift): per-language stopword hit counts over the
    lowercased whitespace tokens, argmax with lang-ascending tie-break,
    'und' at zero hits, integer ppm score."""
    values = ", ".join(
        "('{}', [{}])".format(
            lang, ", ".join(f"'{w}'" for w in sorted(text._LANG_STOPWORDS[lang]))
        )
        for lang in sorted(text._LANG_STOPWORDS)
    )
    return (
        r"WITH toks AS (SELECT doc_id, list_transform(regexp_extract_all("
        r"text, '\S+'), x -> lower(x)) AS toks FROM documents), "
        f"L AS (SELECT * FROM (VALUES {values}) AS t(lang, stops)), "
        "hits AS (SELECT doc_id, lang, length(list_filter(toks, "
        "x -> list_contains(stops, x))) AS hits, "
        "greatest(length(toks), 1) AS n FROM toks CROSS JOIN L), "
        "best AS (SELECT doc_id, lang, hits, n, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn FROM hits) "
        "SELECT doc_id, CASE WHEN hits = 0 THEN 'und' ELSE lang END AS "
        "lang_pred, CAST(CASE WHEN hits = 0 THEN 0 ELSE "
        "(1000000 * hits) // n END AS BIGINT) AS lang_score_ppm "
        "FROM best WHERE rn = 1"
    )


def _winnow_sql(k: int = 8, window: int = 4) -> str:
    """Winnowing oracle: direct polynomial k-gram hashes (base 257 mod
    2^61-1 over what are ASCII == utf-8 bytes here) + a window-min over
    full windows, distinct per doc; short docs (< window full windows)
    contribute their single global min, matching
    `text.winnow_fingerprint`.

    The SQL side hashes via code-point `ascii(substr(...))` and gates on
    code-point `length(text)`, while the op hashes utf-8 BYTES — they
    agree only on pure-ASCII text. The `chk` CTE makes that assumption
    loud: any non-ASCII doc (octet_length != length) raises a DuckDB
    error instead of silently hash-mismatching."""
    mod = (1 << 61) - 1
    pows = [pow(257, k - 1 - j, mod) for j in range(k)]
    terms = " + ".join(
        f"CAST(ascii(substr(text, CAST(i AS INTEGER) + {j}, 1)) AS HUGEINT)"
        f" * {p}"
        for j, p in enumerate(pows)
    )
    return (
        f"WITH chk AS (SELECT coalesce(max(CASE WHEN "
        f"octet_length(encode(text)) <> length(text) THEN "
        f"CAST(error('winnow oracle requires ASCII-only text: doc_id ' "
        f"|| CAST(doc_id AS VARCHAR) || ' is non-ASCII') AS BIGINT) "
        f"ELSE 0 END), 0) AS ok FROM documents), "
        f"pos AS (SELECT doc_id, text, length(text) - {k} + 1 AS n, "
        f"unnest(range(1, length(text) - {k} + 2)) AS i "
        f"FROM documents, chk WHERE length(text) >= {k} AND chk.ok = 0), "
        f"g AS (SELECT doc_id, n, i, CAST(({terms}) % {mod} AS BIGINT) AS h "
        f"FROM pos), "
        f"w AS (SELECT doc_id, n, i, min(h) OVER (PARTITION BY doc_id "
        f"ORDER BY i ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) "
        f"AS m FROM g) "
        f"SELECT DISTINCT doc_id, m AS fingerprint FROM w "
        f"WHERE n > {window} AND i <= n - {window - 1} "
        f"UNION "
        f"SELECT doc_id, min(h) AS fingerprint FROM g WHERE n <= {window} "
        f"GROUP BY doc_id"
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # text analysis
        "token_counts": text.token_counts,
        "text_quality": text.text_quality,
        "lang_id": text.lang_id,
        "content_hash": text.content_hash,
        "winnow_fingerprints": text.winnow_fingerprints,
        "docs_repetition_stats": text.docs_repetition_stats,
        # main-content extraction (HTML boilerplate strip / DOM
        # heuristics / PDF layout parse — synthetic-page exact oracles)
        "docs_html_strip": extraction.docs_html_strip,
        "docs_html_links": extraction.docs_html_links,
        "docs_html_block_stats": extraction.docs_html_block_stats,
        "docs_html_main_content": extraction.docs_html_main_content,
        "docs_html_nested_main_content": (
            extraction.docs_html_nested_main_content
        ),
        "docs_pdf_runs": extraction.docs_pdf_runs,
        "docs_pdf_page_text": extraction.docs_pdf_page_text,
        "docs_pdf_column_text": extraction.docs_pdf_column_text,
        "docs_pdf_multipage_text": extraction.docs_pdf_multipage_text,
        "docs_pdf_dehyphenated_text": extraction.docs_pdf_dehyphenated_text,
        "docs_html_table_extract": extraction.docs_html_table_extract,
        "docs_table_value_rollup": extraction.docs_table_value_rollup,
        # link-graph structure analytics over the doc+ref edge set
        "docs_link_degree": extraction.docs_link_degree,
        "docs_link_anchor_profile": extraction.docs_link_anchor_profile,
        # crawl-frontier URL canonicalization
        "docs_url_normalize": extraction.docs_url_normalize,
        "docs_url_canonical_groups": extraction.docs_url_canonical_groups,
        "docs_frontier_new_urls": extraction.frontier_new_urls,
        # robots-policy crawl gate + per-site budget
        "docs_robots_policy_filter": extraction.docs_robots_policy_filter,
        "source_crawl_budget": extraction.source_crawl_budget,
        # composed crawl-scheduling chain (the crawl pretrain_data_prep)
        "crawl_schedule_prep": extraction.crawl_schedule_prep,
        # document-outline (h1/h2/h3) extraction over sectioned pages
        "docs_html_outline": extraction.docs_html_outline,
        # boilerpipe-style two-feature block filter (vs main-content's pick)
        "docs_block_boilerplate_classify": extraction.docs_block_boilerplate_classify,
        "docs_boilerplate_filtered_text": extraction.docs_boilerplate_filtered_text,
        # iterative graph analytics over the extracted link graph
        # (exact: integer recurrence mirrored in an unrolled-CTE oracle)
        "docs_link_pagerank": extraction.docs_link_pagerank,
        # composed crawl-to-corpus chain (extraction -> quality gate ->
        # per-source rollup) as one lazy zero-shuffle stream
        "web_extract_prep": extraction.web_extract_prep,
        "web_extract_incremental": extraction.web_extract_incremental,
        # dedup
        "dedup_exact": dedup.dedup_exact,
        "dedup_survivors": dedup.dedup_survivors,
        "eval_decontaminate": dedup.eval_decontaminate,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "simhash64": dedup.simhash64,
        "simhash_neardup_pairs": dedup.simhash_neardup_pairs,
        "docs_snapshot_diff": dedup.docs_snapshot_diff,
        "snapshot_new_texts": dedup.snapshot_new_texts,
        "embedding_neardup_pairs": dedup.embedding_neardup_pairs,
        # Sub-quadratic approximate path (hyperplane-LSH banding +
        # exact per-bucket cosine verify): rows-only by design (recall
        # < 1); recall >= 0.8 vs the exact op pinned in tests/test_ops.py.
        "embedding_neardup_pairs_lsh": dedup.embedding_neardup_pairs_lsh,
        "repeated_substring_pairs": dedup.repeated_substring_pairs,
        "docs_dup_gram_fraction": dedup.dup_gram_doc_fraction,
        # similarity search
        "ann_topk_bruteforce": similarity.ann_topk_bruteforce,
        "ann_topk_lsh": similarity.ann_topk_lsh,
        "ann_topk_ivf": similarity.ann_topk_ivf,
        "ann_topk_pq": similarity.ann_topk_pq,
        "ann_topk_ivfpq": similarity.ann_topk_ivfpq,
        "ann_topk_int8": similarity.ann_topk_int8,
        "embedding_label_centroid": similarity.embedding_label_centroid,
        # windowed / temporal / grouped aggregates
        "events_tumbling_window": relational.events_tumbling_window,
        "events_hopping_window": relational.events_hopping_window,
        "events_sessionize": relational.events_sessionize,
        "events_asof_join": relational.events_asof_join,
        "events_range_join": relational.events_range_join,
        "events_daily_active_users": relational.events_daily_active_users,
        "orders_customer_join": relational.orders_customer_join,
        "lineitem_pricing_summary": relational.lineitem_pricing_summary,
        "q3_top_orders": relational.q3_top_orders,
        "inactive_customers": relational.inactive_customers,
        "inactive_customers_anti_join": relational.inactive_customers_anti_join,
        "lineitem_rollup": relational.lineitem_rollup,
        "supplier_region_rollup": relational.supplier_region_rollup,
        "events_value_quantiles": relational.events_value_quantiles,
        "events_sorted_sink_scan": relational.events_sorted_sink_scan,
        "events_distinct_users_hll": relational.events_distinct_users_hll,
        "events_daily_active_users_hll": relational.events_daily_active_users_hll,
        "customer_order_counts": relational.customer_order_counts,
        "orders_with_returns": relational.orders_with_returns,
        "late_shipment_orders": relational.late_shipment_orders,
        "part_small_quantity_revenue": relational.part_small_quantity_revenue,
        "part_type_revenue": relational.part_type_revenue,
        "q5_local_supplier_revenue": relational.q5_local_supplier_revenue,
        "q18_large_orders": relational.q18_large_orders,
        "part_min_price_supplier": relational.part_min_price_supplier,
        "lineitem_qty_price_stats": relational.lineitem_qty_price_stats,
        "segment_top_spender": relational.segment_top_spender,
        "event_type_user_overlap": relational.event_type_user_overlap,
        "events_daily_dense_counts": relational.events_daily_dense_counts,
        "returnflag_revenue_share": relational.returnflag_revenue_share,
        "docs_token_entropy": analytics.docs_token_entropy,
        "embedding_top_component": similarity.embedding_top_component,
        "events_funnel": relational.events_funnel,
        "user_retention": relational.user_retention,
        # top-k / sampling
        "docs_topk_longest": sampling.docs_topk_longest,
        "sample_documents": sampling.sample_documents,
        "docs_split_stats": sampling.docs_split_stats,
        "docs_pack_chunks": sampling.docs_pack_chunks,
        "docs_shuffle_rank": sampling.docs_shuffle_rank,
        "docs_length_outlier_filter": sampling.docs_length_outlier_filter,
        "source_budget_sample": sampling.source_budget_sample,
        "events_bottomk_sample": sampling.events_bottomk_sample,
        "streaming_dedup_filter": dedup.streaming_dedup_filter,
        "fuzzy_name_pairs": dedup.fuzzy_name_pairs,
        # corpus analytics
        "vocab_top_terms": analytics.vocab_top_terms,
        "tfidf_top_terms": analytics.tfidf_top_terms,
        "lm_quality_score": analytics.lm_quality_score,
        "lm_bigram_score": analytics.lm_bigram_score,
        "events_topk_per_group": analytics.events_topk_per_group,
        "events_user_running_sum": analytics.events_user_running_sum,
        "events_global_cumsum": analytics.events_global_cumsum,
        "docs_global_length_rank": analytics.docs_global_length_rank,
        "events_user_pivot": analytics.events_user_pivot,
        "heavy_hitters_exact": analytics.heavy_hitters_exact,
        "heavy_hitters_sketch": analytics.heavy_hitters_sketch,
        "stratified_sample_documents": analytics.stratified_sample_documents,
        "dedup_clusters": analytics.dedup_clusters,
        "substring_dup_clusters": analytics.substring_dup_clusters,
        "neardup_survivors": analytics.neardup_survivors,
        "neardup_best_survivors": analytics.neardup_best_survivors,
        "embedding_cluster_survivors": analytics.embedding_cluster_survivors,
        "embedding_clusters": analytics.embedding_clusters,
        "kmeans_embeddings": similarity.kmeans_embeddings,
        "semdedup_survivors": similarity.semdedup_survivors,
        "docs_semdedup_survivors": similarity.docs_semdedup_survivors,
        "events_user_lag_diff": analytics.events_user_lag_diff,
        "events_user_first_last": analytics.events_user_first_last,
        "events_user_moving_sum": analytics.events_user_moving_sum,
        "events_user_type_sequence": analytics.events_user_type_sequence,
        "events_user_top_type": analytics.events_user_top_type,
        "events_user_ntile": analytics.events_user_ntile,
        "events_user_unpivot": analytics.events_user_unpivot,
        "embedding_quantize_int8": similarity.embedding_quantize_int8,
        "supplier_acctbal_rank": relational.supplier_acctbal_rank,
        "orders_monthly_revenue_delta": relational.orders_monthly_revenue_delta,
        "events_value_mad": relational.events_value_mad,
        "distinct_user_event_types": analytics.distinct_user_event_types,
        "source_distinct_shingles": analytics.source_distinct_shingles,
        "docs_length_histogram": analytics.docs_length_histogram,
        "bm25_topk": analytics.bm25_topk,
        # mergeable sketches
        "events_value_tdigest": sketch.events_value_tdigest,
        "active_customers_bloom": sketch.active_customers_bloom,
        "docs_chunk_overlap": text.docs_chunk_overlap,
        "dedup_normalized": dedup.dedup_normalized,
        "supplier_acctbal_dense_rank": relational.supplier_acctbal_dense_rank,
        "lineitem_cube": relational.lineitem_cube,
        "events_value_band_join": relational.events_value_band_join,
        "events_type_markov_transitions": relational.events_type_markov_transitions,
        "docs_embed_hashing": similarity.docs_embed_hashing,
        "events_props_json_rollup": analytics.events_props_json_rollup,
        "events_user_cumulative_distinct": analytics.events_user_cumulative_distinct,
        "events_user_session_number": analytics.events_user_session_number,
        "events_time_to_purchase": analytics.events_time_to_purchase,
        "supplier_abc_classification": relational.supplier_abc_classification,
        "orders_merge_upsert": relational.orders_merge_upsert,
        "events_weighted_median": relational.events_weighted_median,
        "events_value_outliers": relational.events_value_outliers,
        "pretrain_data_prep": composed.pretrain_data_prep,
        "events_value_cume_dist": analytics.events_value_cume_dist,
        "docs_partitioned_sink_roundtrip": sources.docs_partitioned_sink_roundtrip,
        "docs_compacted_sink_roundtrip": sources.docs_compacted_sink_roundtrip,
        "docs_arrow_ipc_roundtrip": sources.docs_arrow_ipc_roundtrip,
        "docs_jsonl_roundtrip": sources.docs_jsonl_roundtrip,
        "docs_webdataset_roundtrip": sources.docs_webdataset_roundtrip,
        "docs_gopher_quality_filter": text.docs_gopher_quality_filter,
        "docs_pii_scrub": text.docs_pii_scrub,
        "docs_extract_matches": text.docs_extract_matches,
        "docs_normalize_text": text.docs_normalize_text,
        "user_click_purchase_full_outer": relational.user_click_purchase_full_outer,
        # TPC-H-shaped relational suite (Q6/Q7/Q10/Q12/Q14/Q16/Q19/Q22)
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q7_nation_volume": tpch.q7_nation_volume,
        "q10_returned_customers": tpch.q10_returned_customers,
        "q12_priority_linestatus": tpch.q12_priority_linestatus,
        "q14_promo_revenue": tpch.q14_promo_revenue,
        "q16_supplier_part_counts": tpch.q16_supplier_part_counts,
        "q19_disjunctive_revenue": tpch.q19_disjunctive_revenue,
        "q22_idle_balance_customers": tpch.q22_idle_balance_customers,
        "q21_sole_returned_supplier": tpch.q21_sole_returned_supplier,
        "q8_market_share": tpch.q8_market_share,
        "q15_top_supplier": tpch.q15_top_supplier,
        "q9_product_profit": tpch.q9_product_profit,
        "q11_important_parts": tpch.q11_important_parts,
        "q20_heavy_shippers": tpch.q20_heavy_shippers,
    }


def oracle_sql() -> dict[str, str]:
    word_re = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return {
        "token_counts": (
            "SELECT doc_id, "
            r"CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens, "
            f"CAST(length(regexp_extract_all(text, '{word_re}')) AS BIGINT) AS n_word_tokens "
            "FROM documents"
        ),
        "text_quality": (
            "SELECT doc_id, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            r"CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens, "
            "length(regexp_extract_all(text, '[A-Za-z]')) / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE) AS alpha_ratio, "
            "length(regexp_extract_all(text, '[0-9]')) / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE) AS digit_ratio, "
            r"length(regexp_extract_all(text, '\s')) / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE) AS space_ratio, "
            "length(regexp_extract_all(text, '[A-Z]')) / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE) AS upper_ratio, "
            f"length(list_filter(regexp_extract_all(lower(text), '\\S+'), t -> t IN ({_STOP_LIST}))) "
            r"/ CAST(CASE WHEN length(regexp_extract_all(text, '\S+')) = 0 THEN 1 ELSE length(regexp_extract_all(text, '\S+')) END AS DOUBLE) AS stopword_ratio "
            "FROM documents"
        ),
        "content_hash": "SELECT doc_id, md5(text) AS text_md5 FROM documents",
        "docs_html_strip": extraction.html_strip_sql(),
        "docs_html_links": extraction.html_links_sql(),
        "docs_html_block_stats": extraction.html_block_stats_sql(),
        "docs_html_main_content": extraction.html_main_content_sql(),
        "docs_html_nested_main_content": (
            extraction.html_nested_main_content_sql()
        ),
        "docs_pdf_runs": extraction.pdf_runs_sql(),
        "docs_pdf_page_text": extraction.pdf_page_text_sql(),
        "docs_pdf_column_text": extraction.pdf_column_text_sql(),
        "docs_pdf_multipage_text": extraction.pdf_multipage_text_sql(),
        "docs_pdf_dehyphenated_text": extraction.pdf_dehyphenated_text_sql(),
        "docs_html_table_extract": extraction.html_table_extract_sql(),
        "docs_table_value_rollup": extraction.table_value_rollup_sql(),
        "docs_link_degree": extraction.link_degree_sql(),
        "docs_link_anchor_profile": extraction.link_anchor_profile_sql(),
        "docs_url_normalize": extraction.url_normalize_sql(),
        "docs_url_canonical_groups": extraction.url_canonical_groups_sql(),
        "docs_frontier_new_urls": extraction.frontier_new_urls_sql(),
        "docs_robots_policy_filter": extraction.robots_policy_filter_sql(),
        "source_crawl_budget": extraction.source_crawl_budget_sql(),
        "crawl_schedule_prep": extraction.crawl_schedule_prep_sql(),
        "docs_html_outline": extraction.html_outline_sql(),
        "docs_block_boilerplate_classify": extraction.block_boilerplate_classify_sql(),
        "docs_boilerplate_filtered_text": extraction.boilerplate_filtered_text_sql(),
        "docs_link_pagerank": extraction.link_pagerank_sql(),
        "web_extract_prep": extraction.web_extract_prep_sql(_STOP_LIST),
        "web_extract_incremental": extraction.web_extract_incremental_sql(),
        "docs_repetition_stats": (
            # Total shingles mirror _shingles' conventions: 0 tokens ->
            # 0, fewer than 3 tokens -> the single joined shingle.
            f"WITH {_NGRAM_PAIRS_CTE} "
            "SELECT d.doc_id, CAST(CASE WHEN d.ntok = 0 THEN 0 "
            "WHEN d.ntok < 3 THEN 1 ELSE d.ntok - 2 END AS BIGINT) "
            "AS n_shingles, "
            "CAST(length(sh.sset) AS BIGINT) AS n_distinct "
            "FROM (SELECT doc_id, "
            r"length(regexp_extract_all(text, '\S+')) AS ntok "
            "FROM documents) d JOIN sh ON d.doc_id = sh.doc_id"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_md5, CAST(min(doc_id) AS BIGINT) AS doc_id "
            "FROM documents GROUP BY md5(text)"
        ),
        "dedup_survivors": (
            "SELECT d.doc_id, d.source, d.n_chars FROM documents d "
            "WHERE d.doc_id IN "
            "(SELECT min(doc_id) FROM documents GROUP BY md5(text))"
        ),
        "embedding_neardup_pairs": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4"
        ),
        "ann_topk_bruteforce": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 10), "
            "sims AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS s "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid) "
            "SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank FROM ("
            "SELECT query_id, neighbor_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rnk "
            "FROM sims) t WHERE rnk <= 10"
        ),
        "events_tumbling_window": (
            "SELECT event_type, "
            "CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1, 2"
        ),
        "events_hopping_window": (
            "SELECT event_type, "
            "CAST((floor(epoch(ts) / 300) - j) * 300 AS BIGINT) AS window_start, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events CROSS JOIN (VALUES (0), (1)) t(j) GROUP BY 1, 2"
        ),
        "events_range_join": (
            "SELECT p.event_id AS purchase_event_id, "
            "e.event_id AS error_event_id, p.user_id "
            "FROM events p JOIN events e ON p.user_id = e.user_id "
            "AND p.event_type = 'purchase' AND e.event_type = 'error' "
            "AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 6 HOUR"
        ),
        "events_daily_active_users": (
            "SELECT event_type, "
            "CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1, 2"
        ),
        "customer_order_counts": (
            "SELECT CAST(c_count AS BIGINT) AS c_count, "
            "CAST(count(*) AS BIGINT) AS custdist FROM ("
            "SELECT c.c_custkey, count(o.o_orderkey) AS c_count "
            "FROM customer c LEFT OUTER JOIN orders o "
            "ON c.c_custkey = o.o_custkey "
            "AND o.o_orderpriority <> '1-URGENT' "
            "GROUP BY c.c_custkey) t GROUP BY c_count"
        ),
        "part_small_quantity_revenue": (
            "WITH s AS (SELECT l_partkey, "
            "SUM(CAST(l_quantity AS BIGINT)) AS sum_qty, "
            "count(*) AS n FROM lineitem GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_small, "
            "CAST(COALESCE(sum(CAST(round(l.l_extendedprice * 1000000) "
            "AS BIGINT)), 0) AS BIGINT) AS revenue_micro "
            "FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey "
            "WHERE 5 * s.n * CAST(l.l_quantity AS BIGINT) < s.sum_qty"
        ),
        "orders_with_returns": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count "
            "FROM orders o "
            "WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') "
            "GROUP BY 1"
        ),
        "late_shipment_orders": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_orders "
            "FROM orders o "
            "WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY) "
            "GROUP BY 1"
        ),
        "q3_top_orders": (
            "WITH c AS (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING'), "
            "rev AS (SELECT l.l_orderkey AS o_orderkey, "
            "CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us, "
            "CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 1000000) "
            "AS BIGINT)) AS BIGINT) AS revenue_micro "
            "FROM orders o "
            "JOIN c ON o.o_custkey = c.c_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_orderdate < TIMESTAMP '1998-06-01' "
            "AND l.l_shipdate > TIMESTAMP '1998-06-01' "
            "GROUP BY 1, 2) "
            "SELECT o_orderkey, o_orderdate_us, revenue_micro FROM rev "
            "ORDER BY revenue_micro DESC, o_orderkey LIMIT 10"
        ),
        "inactive_customers": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2001-01-01')"
        ),
        "lineitem_rollup": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n_rows "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "inactive_customers_anti_join": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2001-01-01')"
        ),
        "events_sorted_sink_scan": (
            "SELECT CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'"
        ),
        "events_value_quantiles": (
            "SELECT event_type, "
            "CAST(quantile_disc(CAST(round(value * 1000000) AS BIGINT), 0.5) "
            "AS BIGINT) AS p50_micro, "
            "CAST(quantile_disc(CAST(round(value * 1000000) AS BIGINT), 0.95) "
            "AS BIGINT) AS p95_micro, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1"
        ),
        "events_funnel": (
            "WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
            "WHERE event_type = 'signup' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1 "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS stage_name, "
            "CAST(count(*) AS BIGINT) AS n_users FROM s1 "
            "UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2 "
            "UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3"
        ),
        "user_retention": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events) "
            "SELECT a.day, CAST(count(*) AS BIGINT) AS n_retained "
            "FROM d a JOIN d b ON a.user_id = b.user_id "
            "AND b.day = a.day + 7 GROUP BY 1"
        ),
        "part_type_revenue": (
            "SELECT p.p_type, "
            "CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 1000000) "
            "AS BIGINT)) AS BIGINT) AS sum_revenue_micro, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY 1"
        ),
        "supplier_region_rollup": (
            "SELECT r.r_name, "
            "CAST(sum(CAST(round(s.s_acctbal * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_acctbal_micro, "
            "CAST(count(*) AS BIGINT) AS n_suppliers "
            "FROM supplier s "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY 1"
        ),
        "ngram_jaccard_pairs": (
            f"WITH {_NGRAM_PAIRS_CTE} "
            "SELECT doc_a, doc_b FROM pairs WHERE 10 * inter >= 8 * uni"
        ),
        "dedup_clusters": (
            # Transitive closure (min-label) over the exact near-dup
            # pair graph; singletons are their own cluster.
            f"WITH RECURSIVE {_NGRAM_PAIRS_CTE}, "
            "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
            "WHERE 10 * inter >= 8 * uni "
            "UNION ALL SELECT doc_b, doc_a FROM pairs "
            "WHERE 10 * inter >= 8 * uni), "
            "reach(src, node) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u) "
            "SELECT node AS doc_id, CAST(min(src) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node"
        ),
        "neardup_survivors": (
            # Component roots keep themselves: no smaller doc reaches
            # them in the near-dup graph.
            f"WITH RECURSIVE {_NGRAM_PAIRS_CTE}, "
            "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
            "WHERE 10 * inter >= 8 * uni "
            "UNION ALL SELECT doc_b, doc_a FROM pairs "
            "WHERE 10 * inter >= 8 * uni), "
            "reach(src, node) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u) "
            "SELECT CAST(node AS BIGINT) AS doc_id "
            "FROM reach GROUP BY node HAVING min(src) = node"
        ),
        "neardup_best_survivors": (
            # One survivor per component, ranked by quality: longest
            # member wins (n_chars desc, doc_id asc); singletons keep
            # themselves with cluster_id = doc_id.
            f"WITH RECURSIVE {_NGRAM_PAIRS_CTE}, "
            "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
            "WHERE 10 * inter >= 8 * uni "
            "UNION ALL SELECT doc_b, doc_a FROM pairs "
            "WHERE 10 * inter >= 8 * uni), "
            "reach(src, node) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u), "
            "cl AS (SELECT node AS doc_id, min(src) AS cluster_id "
            "FROM reach GROUP BY node), "
            "ranked AS (SELECT cl.doc_id, cl.cluster_id, "
            "row_number() OVER (PARTITION BY cl.cluster_id "
            "ORDER BY d.n_chars DESC, cl.doc_id ASC) AS rn "
            "FROM cl JOIN documents d ON cl.doc_id = d.doc_id) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(cluster_id AS BIGINT) AS cluster_id "
            "FROM ranked WHERE rn = 1"
        ),
        "embedding_clusters": (
            "WITH RECURSIVE prs AS (SELECT a.vec_id AS u, b.vec_id AS v "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4), "
            "edges AS (SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs), "
            "reach(src, node) AS ("
            "SELECT vec_id, vec_id FROM embeddings "
            "UNION "
            "SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u) "
            "SELECT node AS vec_id, CAST(min(src) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node"
        ),
        "embedding_cluster_survivors": (
            "WITH RECURSIVE prs AS (SELECT a.vec_id AS u, b.vec_id AS v "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4), "
            "edges AS (SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs), "
            "reach(src, node) AS ("
            "SELECT vec_id, vec_id FROM embeddings "
            "UNION "
            "SELECT r.src, e.v FROM reach r JOIN edges e ON r.node = e.u) "
            "SELECT CAST(node AS BIGINT) AS vec_id "
            "FROM reach GROUP BY node HAVING min(src) = node"
        ),
        "vocab_top_terms": (
            "SELECT token, CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token "
            "FROM documents) GROUP BY token ORDER BY n DESC, token LIMIT 20"
        ),
        "tfidf_top_terms": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM toks GROUP BY 1, 2), "
            "df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
            "FROM toks GROUP BY 1) "
            "SELECT doc_id, term, tf, df, CAST(rnk AS BIGINT) AS rank FROM ("
            "SELECT tf.doc_id, tf.term, tf.tf, df.df, "
            "row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rnk "
            "FROM tf JOIN df USING (term)) t WHERE rnk <= 3"
        ),
        "events_topk_per_group": (
            "SELECT event_type, event_id, value_micro, CAST(rnk AS BIGINT) AS rank "
            "FROM (SELECT event_type, event_id, "
            "CAST(round(value * 1000000) AS BIGINT) AS value_micro, "
            "row_number() OVER (PARTITION BY event_type "
            "ORDER BY CAST(round(value * 1000000) AS BIGINT) DESC, event_id) AS rnk "
            "FROM events) t WHERE rnk <= 3"
        ),
        "events_user_running_sum": (
            "SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_micro "
            "FROM events"
        ),
        "docs_global_length_rank": (
            "SELECT doc_id, CAST(row_number() OVER ("
            "ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) "
            "AS length_rank FROM documents"
        ),
        "events_global_cumsum": (
            "SELECT CAST(event_id AS BIGINT) AS event_id, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER ("
            "ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS cum_value_micro FROM events"
        ),
        "events_user_pivot": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS n_{t}"
                for t in analytics.EVENT_TYPES
            )
            + ", CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro FROM events GROUP BY 1"
        ),
        "q5_local_supplier_revenue": (
            "SELECT n.n_name AS n_name, "
            "CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 1000000) "
            "AS BIGINT)) AS BIGINT) AS revenue_micro, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM customer c "
            "JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "WHERE r.r_name = 'MIDDLE EAST' "
            "AND c.c_nationkey = s.s_nationkey "
            "AND o.o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1999-01-01' "
            "GROUP BY 1"
        ),
        "events_user_first_last": (
            "SELECT user_id, "
            "CAST(first(event_id ORDER BY ts, event_id) AS BIGINT) AS first_event_id, "
            "CAST(last(event_id ORDER BY ts, event_id) AS BIGINT) AS last_event_id, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1"
        ),
        "events_user_moving_sum": (
            "SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum_micro "
            "FROM events"
        ),
        "distinct_user_event_types": (
            "SELECT DISTINCT user_id, event_type FROM events"
        ),
        "source_distinct_shingles": _source_distinct_shingles_sql(),
        "events_user_lag_diff": (
            "SELECT event_id, user_id, "
            "CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS dt_us, "
            "CAST(CAST(round(value * 1000000) AS BIGINT) - "
            "CAST(round(lag(value) OVER w * 1000000) AS BIGINT) AS BIGINT) "
            "AS dvalue_micro "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            "QUALIFY lag(ts) OVER w IS NOT NULL"
        ),
        "docs_length_histogram": (
            "SELECT CAST(n_chars // 100 * 100 AS BIGINT) AS bucket_start, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1"
        ),
        "heavy_hitters_exact": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY 1 ORDER BY n DESC, user_id LIMIT 20"
        ),
        "stratified_sample_documents": (
            "SELECT doc_id, lang, n_chars FROM documents "
            f"WHERE {_MD5_BUCKET} % (CASE "
            + " ".join(
                f"WHEN lang = '{lang}' THEN {rate}"
                for lang, rate in sorted(analytics.STRATA_RATES.items())
            )
            + " ELSE 1 END) = 0"
        ),
        "events_sessionize": (
            "WITH e AS (SELECT user_id, ts, event_id, value, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000 "
            "THEN 1 ELSE 0 END AS new_sess "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, sum(new_sess) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS session_id FROM e) "
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
            "CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us, "
            "CAST(max(epoch_us(ts)) AS BIGINT) AS session_end_us, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro "
            "FROM s GROUP BY 1, 2"
        ),
        "events_asof_join": (
            "WITH p AS (SELECT event_id, ts, user_id FROM events "
            "WHERE event_type = 'purchase'), "
            "s AS (SELECT event_id AS signup_event_id, ts AS sts, user_id "
            "FROM events WHERE event_type = 'signup') "
            "SELECT p.event_id AS purchase_event_id, p.user_id, s.signup_event_id "
            "FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.sts"
        ),
        "orders_customer_join": (
            "SELECT c.c_nationkey, "
            "CAST(sum(CAST(round(o.o_totalprice * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_total_micro, "
            "CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY 1"
        ),
        "lineitem_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(round(l_quantity * 1000000) AS BIGINT)) AS BIGINT) AS sum_qty_micro, "
            "CAST(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS sum_base_micro, "
            "CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000) AS BIGINT)) AS BIGINT) AS sum_disc_micro, "
            "CAST(count(*) AS BIGINT) AS n_rows "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY 1, 2"
        ),
        "docs_topk_longest": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 50"
        ),
        "sample_documents": (
            "SELECT doc_id, n_chars FROM documents "
            f"WHERE {_MD5_BUCKET} % 20 = 0"
        ),
        "docs_split_stats": (
            f"SELECT CASE WHEN ({_MD5_BUCKET} >> 28) < 12 THEN 'train' "
            f"WHEN ({_MD5_BUCKET} >> 28) < 14 THEN 'val' ELSE 'test' END "
            "AS split, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY 1"
        ),
        "docs_pack_chunks": (
            "SELECT doc_id, "
            f"CAST({_MD5_BUCKET} % 8 AS BIGINT) AS pack_part, "
            "CAST((cum - n_chars) // 4096 AS BIGINT) AS bin_id, "
            "CAST((cum - n_chars) % 4096 AS BIGINT) AS bin_offset "
            "FROM (SELECT doc_id, n_chars, sum(n_chars) OVER "
            f"(PARTITION BY {_MD5_BUCKET} % 8 ORDER BY doc_id) AS cum "
            "FROM documents) t"
        ),
        "docs_shuffle_rank": (
            "SELECT doc_id, CAST(row_number() OVER "
            f"(ORDER BY {_MD5_BUCKET}, doc_id) - 1 AS BIGINT) "
            "AS shuffle_rank FROM documents"
        ),
        "docs_length_outlier_filter": (
            "SELECT doc_id, n_chars FROM documents WHERE n_chars <= "
            "(SELECT quantile_disc(n_chars, 0.99) FROM documents)"
        ),
        "source_budget_sample": (
            "WITH thr AS (SELECT source, "
            "least(1000000, (CAST(3000 AS BIGINT) * 1000000) "
            "// CAST(sum(n_chars) AS BIGINT)) "
            "AS lim FROM documents GROUP BY source) "
            "SELECT d.doc_id, d.source, d.n_chars "
            "FROM documents d JOIN thr USING (source) "
            "WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) "
            "|| ':mix'), 1, 8)) AS UBIGINT) % 1000000 < thr.lim"
        ),
        "embedding_label_centroid": (
            "SELECT CAST(label AS BIGINT) AS label, "
            "CAST(dim AS BIGINT) AS dim, "
            "CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) "
            "AS BIGINT) AS sum_micro, "
            "CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT label, unnest(embedding) AS v, "
            "generate_subscripts(embedding, 1) AS dim FROM embeddings) "
            "GROUP BY 1, 2"
        ),
        "lm_quality_score": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t "
            "FROM documents), "
            "cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t), "
            "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM cnt) "
            "SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(CAST(round(1000000 * ln(CAST(cnt.c AS DOUBLE) / tot.s)) "
            "AS BIGINT)) AS BIGINT) AS sum_logp_micro "
            "FROM tok JOIN cnt ON tok.t = cnt.t CROSS JOIN tot "
            "GROUP BY tok.doc_id"
        ),
        "events_value_mad": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 1000000) AS BIGINT) AS vm FROM events), "
            "m AS (SELECT event_type, "
            "CAST(quantile_disc(vm, 0.5) AS BIGINT) AS median_micro, "
            "CAST(count(*) AS BIGINT) AS n_events FROM v GROUP BY 1) "
            "SELECT m.event_type, m.median_micro, "
            "CAST(quantile_disc(abs(v.vm - m.median_micro), 0.5) AS BIGINT) "
            "AS mad_micro, m.n_events "
            "FROM v JOIN m ON v.event_type = m.event_type "
            "GROUP BY m.event_type, m.median_micro, m.n_events"
        ),
        "events_user_unpivot": (
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "t AS (SELECT unnest(['click', 'error', 'purchase', 'signup', "
            "'view']) AS event_type), "
            "c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1, 2) "
            "SELECT u.user_id, t.event_type, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n "
            "FROM u CROSS JOIN t "
            "LEFT JOIN c ON c.user_id = u.user_id "
            "AND c.event_type = t.event_type"
        ),
        # embedding_quantize_int8 carries a float per-vector scale —
        # rows-only; reconstruction/cosine bounds pinned in
        # tests/test_analytics.py.
        "fuzzy_name_pairs": (
            "WITH n AS (SELECT DISTINCT p_name FROM part) "
            "SELECT a.p_name AS name_a, b.p_name AS name_b, "
            "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist "
            "FROM n a JOIN n b ON a.p_name < b.p_name "
            "WHERE levenshtein(a.p_name, b.p_name) <= 2"
        ),
        "orders_monthly_revenue_delta": (
            "WITH m AS (SELECT CAST(year(o_orderdate) * 100 "
            "+ month(o_orderdate) AS BIGINT) AS month, "
            "CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) "
            "AS BIGINT) AS revenue_micro FROM orders GROUP BY 1) "
            "SELECT month, revenue_micro, "
            "CAST(revenue_micro - lag(revenue_micro) OVER (ORDER BY month) "
            "AS BIGINT) AS delta_micro FROM m "
            "QUALIFY lag(revenue_micro) OVER (ORDER BY month) IS NOT NULL"
        ),
        "events_bottomk_sample": (
            "WITH h AS (SELECT event_type, event_id, "
            "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':bk'), "
            "1, 8)) AS UBIGINT) AS h FROM events), "
            "r AS (SELECT event_type, event_id, CAST(h AS BIGINT) AS h, "
            "row_number() OVER (PARTITION BY event_type "
            "ORDER BY h, event_id) AS rn FROM h) "
            "SELECT event_type, event_id, h FROM r WHERE rn <= 20"
        ),
        "events_user_ntile": (
            "SELECT event_id, user_id, "
            "CAST(ntile(4) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS BIGINT) AS bucket FROM events"
        ),
        "supplier_acctbal_rank": (
            "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, "
            "CAST(s_nationkey AS BIGINT) AS s_nationkey, "
            "CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents, "
            "CAST(rank() OVER (PARTITION BY s_nationkey "
            "ORDER BY round(s_acctbal * 100) DESC) AS BIGINT) AS bal_rank "
            "FROM supplier"
        ),
        "events_daily_dense_counts": (
            "WITH c AS (SELECT event_type, "
            "CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1, 2), "
            "spine AS (SELECT CAST(unnest(generate_series("
            "(SELECT min(day) FROM c), (SELECT max(day) FROM c))) AS BIGINT) "
            "AS day), "
            "types AS (SELECT DISTINCT event_type FROM c) "
            "SELECT t.event_type, s.day, "
            "CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events "
            "FROM types t CROSS JOIN spine s "
            "LEFT JOIN c ON c.event_type = t.event_type AND c.day = s.day"
        ),
        "returnflag_revenue_share": (
            "WITH r AS (SELECT l_returnflag, "
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) "
            "* 1000000) AS BIGINT)) AS BIGINT) AS revenue_micro "
            "FROM lineitem GROUP BY 1) "
            "SELECT l_returnflag, revenue_micro, "
            "CAST((1000000 * CAST(revenue_micro AS HUGEINT)) "
            "// (SELECT sum(CAST(revenue_micro AS HUGEINT)) FROM r) "
            "AS BIGINT) AS share_ppm FROM r"
        ),
        "event_type_user_overlap": (
            "WITH u AS (SELECT user_id, "
            "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_a, "
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_b "
            "FROM events GROUP BY user_id) "
            "SELECT CAST(has_a AS BIGINT) AS has_a, "
            "CAST(has_b AS BIGINT) AS has_b, "
            "CAST(count(*) AS BIGINT) AS n_users FROM u GROUP BY 1, 2"
        ),
        "docs_token_entropy": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t "
            "FROM documents), "
            "c AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS c "
            "FROM tok GROUP BY 1, 2), "
            "n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1) "
            "SELECT c.doc_id, CAST(n.n AS BIGINT) AS n_tokens, "
            "CAST(sum(CAST(round(-1000000 * (c.c / n.n) * ln(c.c / n.n)) "
            "AS BIGINT)) AS BIGINT) AS entropy_micro "
            "FROM c JOIN n ON c.doc_id = n.doc_id "
            "GROUP BY c.doc_id, n.n"
        ),
        # embedding_top_component is iterative (power iteration, float
        # eigenvector) — not SQL-expressible; rows-only for the driver,
        # pinned by the eigenpair residual test in tests/test_analytics.py.
        "events_user_type_sequence": (
            "SELECT user_id, "
            "string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY user_id"
        ),
        "events_user_top_type": (
            "WITH c AS (SELECT user_id, event_type, "
            "CAST(count(*) AS BIGINT) AS n, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) "
            "SELECT user_id, event_type AS top_type, n FROM c WHERE rn = 1"
        ),
        "q18_large_orders": (
            "WITH q AS (SELECT l_orderkey, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250) "
            "SELECT c.c_name, c.c_custkey, o.o_orderkey, "
            "CAST(round(o.o_totalprice * 1000000) AS BIGINT) AS total_micro, "
            "q.sum_qty FROM q "
            "JOIN orders o ON q.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "part_min_price_supplier": (
            "WITH c AS (SELECT l_partkey, l_suppkey, "
            "CAST(round(l_extendedprice * 1000000) AS BIGINT) AS price_micro, "
            "row_number() OVER (PARTITION BY l_partkey "
            "ORDER BY round(l_extendedprice * 1000000), l_suppkey) AS rn "
            "FROM lineitem) "
            "SELECT c.l_partkey AS p_partkey, p.p_brand, "
            "c.price_micro AS min_price_micro, "
            "CAST(c.l_suppkey AS BIGINT) AS s_suppkey "
            "FROM c JOIN part p ON c.l_partkey = p.p_partkey WHERE c.rn = 1"
        ),
        "lineitem_qty_price_stats": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS sum_qty, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT) "
            "* CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_sq, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS sum_price_cents, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT) "
            "* CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_qty_price_cents "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "segment_top_spender": (
            "WITH s AS (SELECT o_custkey, "
            "CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) "
            "AS BIGINT) AS spend_micro FROM orders GROUP BY o_custkey), "
            "r AS (SELECT c.c_mktsegment, c.c_custkey, s.spend_micro, "
            "row_number() OVER (PARTITION BY c.c_mktsegment "
            "ORDER BY s.spend_micro DESC, c.c_custkey) AS rn "
            "FROM s JOIN customer c ON s.o_custkey = c.c_custkey) "
            "SELECT c_mktsegment, c_custkey, spend_micro FROM r WHERE rn = 1"
        ),
        "lm_bigram_score": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t, "
            "generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) "
            "AS pos FROM documents), "
            "bg AS (SELECT doc_id, "
            "lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w1, t AS w2 "
            "FROM tok QUALIFY w1 IS NOT NULL), "
            "c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2), "
            "c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1) "
            "SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
            "CAST(sum(CAST(round(1000000 * ln(CAST(c2.n2 AS DOUBLE) / c1.n1)) "
            "AS BIGINT)) AS BIGINT) AS sum_logp_micro "
            "FROM bg JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2 "
            "JOIN c1 ON bg.w1 = c1.w1 "
            "GROUP BY bg.doc_id"
        ),
        "eval_decontaminate": (
            f"WITH {_NGRAM_PAIRS_CTE}, "
            "ev AS (SELECT list_distinct(flatten(list(sset))) AS evs "
            f"FROM sh WHERE {_MD5_BUCKET} % 20 = 0) "
            "SELECT s.doc_id, "
            "CAST(length(list_intersect(s.sset, ev.evs)) AS BIGINT) "
            "AS n_shared FROM sh s CROSS JOIN ev "
            f"WHERE {_MD5_BUCKET} % 20 <> 0 "
            "AND length(list_intersect(s.sset, ev.evs)) > 0"
        ),
        # streaming_dedup_filter is first-seen-wins against a shared
        # mutable actor index: survivor IDs are arrival-order-dependent
        # (rows-only; count + hash-uniqueness pinned in
        # tests/test_quarantine.py).
        # minhash_lsh_pairs,
        # ann_topk_lsh, ann_topk_ivf, ann_topk_pq, ann_topk_ivfpq,
        # events_distinct_users_hll,
        # events_daily_active_users_hll,
        # heavy_hitters_sketch, kmeans_embeddings, events_value_tdigest,
        # active_customers_bloom and bm25_topk are heuristic / sketch /
        # iterative / float-scored (not SQL-expressible bit-exactly):
        # rows-only for the driver, pinned by exact reference
        # implementations, recall/error bounds, or 1e-12 score parity in
        # tests/test_ops.py, tests/test_analytics.py, tests/test_sketch.py.
        "simhash64": (
            # Derived from the same _SIMHASH_CTE the pairs oracle uses
            # (single fingerprint definition — no drift possible); the
            # CTE coalesces the no-token case to h = 0, whose lpad'd
            # hex is exactly the '0' * 16 the op emits.
            f"WITH {_SIMHASH_CTE} "
            "SELECT doc_id, lpad(lower(to_hex(h)), 16, '0') AS simhash "
            "FROM sh"
        ),
        "simhash_neardup_pairs": _simhash_pairs_sql(),
        # Both snapshot oracles render from dedup's shared mutation
        # constants — the one source of truth for snapshot B.
        "docs_snapshot_diff": (
            "WITH a AS (SELECT doc_id, md5(text) AS h FROM documents), "
            f"b AS (SELECT doc_id, CASE WHEN doc_id % {dedup.SNAPSHOT_CHG_MOD} = 0 "
            f"THEN md5('{dedup.SNAPSHOT_REV_PREFIX}' || text) ELSE md5(text) END AS h "
            f"FROM documents WHERE doc_id % {dedup.SNAPSHOT_DEL_MOD} != 0 "
            f"UNION ALL SELECT doc_id + {dedup.SNAPSHOT_ID_OFFSET} AS doc_id, "
            f"md5(text) AS h FROM documents WHERE doc_id % {dedup.SNAPSHOT_ADD_MOD} = 0), "
            "f AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, "
            "CASE WHEN b.doc_id IS NULL THEN 'removed' "
            "WHEN a.doc_id IS NULL THEN 'added' "
            "WHEN a.h != b.h THEN 'changed' ELSE 'unchanged' END AS status "
            "FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, status FROM f "
            "WHERE status != 'unchanged'"
        ),
        "snapshot_new_texts": (
            f"WITH b AS ({dedup.snapshot_b_sql_cte()}) "
            "SELECT CAST(b.doc_id AS BIGINT) AS doc_id, b.status FROM b "
            "WHERE NOT EXISTS (SELECT 1 FROM documents d "
            "WHERE d.text = b.text)"
        ),
        "winnow_fingerprints": _winnow_sql(),
        "lang_id": _lang_id_sql(),
        "repeated_substring_pairs": _repeated_substring_sql(),
        "docs_dup_gram_fraction": _dup_gram_fraction_sql(),
        "substring_dup_clusters": _substring_clusters_sql(),
        "events_value_band_join": (
            "SELECT a.event_id AS event_a, b.event_id AS event_b, "
            "CAST(abs(CAST(round(a.value * 1000000) AS BIGINT) "
            "- CAST(round(b.value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS dv_micro "
            "FROM events a JOIN events b ON a.event_id < b.event_id "
            "WHERE a.event_type = 'purchase' AND b.event_type = 'purchase' "
            "AND abs(CAST(round(a.value * 1000000) AS BIGINT) "
            "- CAST(round(b.value * 1000000) AS BIGINT)) <= 50000"
        ),
        "lineitem_cube": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n_rows "
            "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
        ),
        "events_type_markov_transitions": (
            "WITH s AS (SELECT event_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev_type FROM events) "
            "SELECT prev_type, event_type AS next_type, "
            "CAST(count(*) AS BIGINT) AS n_transitions FROM s "
            "WHERE prev_type IS NOT NULL GROUP BY 1, 2"
        ),
        "supplier_acctbal_dense_rank": (
            "SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey, "
            "CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents, "
            "CAST(dense_rank() OVER (PARTITION BY s_nationkey "
            "ORDER BY CAST(round(s_acctbal * 100) AS BIGINT) DESC) AS BIGINT) "
            "AS bal_dense_rank FROM supplier"
        ),
        # docs_embed_hashing is a float-vector inference stage
        # (rows-only; determinism + unit norm + exact kernel values
        # pinned in tests/test_ops.py).
        "dedup_normalized": (
            r"SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) "
            "AS norm_md5, CAST(min(doc_id) AS BIGINT) AS doc_id "
            "FROM documents GROUP BY 1"
        ),
        "events_props_json_rollup": (
            "WITH k AS (SELECT event_type, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(k) AS BIGINT) AS sum_k, "
            "CAST(min(k) AS BIGINT) AS min_k, "
            "CAST(max(k) AS BIGINT) AS max_k "
            "FROM k GROUP BY 1"
        ),
        "pretrain_data_prep": (
            f"WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS toks FROM documents), m AS (SELECT doc_id, unnest(toks) AS tok FROM t), top AS (SELECT doc_id, max(c) AS top_cnt FROM (SELECT doc_id, tok, count(*) AS c FROM m GROUP BY 1, 2) GROUP BY 1), sig AS (SELECT t.doc_id, t.text, length(t.toks) AS n_tok, COALESCE(list_sum(list_transform(t.toks, x -> length(x))), 0) AS sum_len, COALESCE(top.top_cnt, 0) AS top_cnt, length(list_filter(t.toks, x -> x IN ({_STOP_LIST}))) AS stop_cnt FROM t LEFT JOIN top ON t.doc_id = top.doc_id), k AS (SELECT doc_id, text, n_tok FROM sig WHERE n_tok >= 20 AND n_tok <= 100000 AND (1000 * sum_len) // greatest(n_tok, 1) BETWEEN 3000 AND 10000 AND (1000000 * top_cnt) // greatest(n_tok, 1) <= 200000 AND (1000000 * stop_cnt) // greatest(n_tok, 1) >= 10000), w AS (SELECT min(doc_id) AS doc_id FROM (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h FROM k) GROUP BY h), s AS (SELECT k.doc_id, k.n_tok, CASE WHEN (CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) >> 28) < 12 THEN 'train' WHEN (CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) >> 28) < 14 THEN 'val' ELSE 'test' END AS split, CASE WHEN k.n_tok = 0 THEN 0 ELSE (k.n_tok - 1) // 24 + 1 END AS c FROM k JOIN w ON k.doc_id = w.doc_id) SELECT split, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(c) AS BIGINT) AS n_chunks, CAST(sum(COALESCE(list_sum(list_transform(range(0, CAST(c AS BIGINT)), i -> least(32, n_tok - 24 * i))), 0)) AS BIGINT) AS n_chunk_tokens FROM s GROUP BY 1"
        ),
        "events_value_outliers": (
            "WITH v AS (SELECT event_id, event_type, "
            "CAST(round(value * 1000000) AS BIGINT) AS vm FROM events), "
            "m AS (SELECT event_type, "
            "CAST(quantile_disc(vm, 0.5) AS BIGINT) AS med FROM v GROUP BY 1), "
            "d AS (SELECT v.event_type, "
            "CAST(quantile_disc(abs(v.vm - m.med), 0.5) AS BIGINT) AS mad "
            "FROM v JOIN m ON v.event_type = m.event_type GROUP BY 1) "
            "SELECT v.event_id, v.event_type, v.vm AS value_micro "
            "FROM v JOIN m ON v.event_type = m.event_type "
            "JOIN d ON v.event_type = d.event_type "
            "WHERE abs(v.vm - m.med) > 3 * d.mad"
        ),
        "events_weighted_median": (
            "WITH k AS (SELECT event_type, "
            "CAST(round(value * 1000000) AS BIGINT) AS v, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS w FROM events), "
            "g AS (SELECT event_type, v, sum(w) AS w FROM k GROUP BY 1, 2), "
            "c AS (SELECT event_type, v, "
            "sum(w) OVER (PARTITION BY event_type ORDER BY v "
            "ROWS UNBOUNDED PRECEDING) AS cw, "
            "sum(w) OVER (PARTITION BY event_type) AS tw FROM g) "
            "SELECT event_type, CAST(min(v) AS BIGINT) AS wmedian_micro "
            "FROM c WHERE 2 * cw >= tw GROUP BY 1"
        ),
        "orders_merge_upsert": (
            "SELECT o_orderkey, CASE WHEN o_orderkey % 10 = 0 "
            "THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority "
            "FROM orders WHERE o_orderkey % 97 <> 0 "
            "UNION ALL "
            "SELECT -o_orderkey AS o_orderkey, '5-LOW' AS o_orderpriority "
            "FROM orders WHERE o_orderkey % 13 = 5"
        ),
        "supplier_abc_classification": (
            "WITH s AS (SELECT s_suppkey, "
            "CAST(s_nationkey AS BIGINT) AS s_nationkey, "
            "CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents "
            "FROM supplier WHERE CAST(round(s_acctbal * 100) AS BIGINT) >= 0), "
            "c AS (SELECT *, sum(acctbal_cents) OVER (PARTITION BY s_nationkey "
            "ORDER BY acctbal_cents DESC, s_suppkey "
            "ROWS UNBOUNDED PRECEDING) AS cum, "
            "sum(acctbal_cents) OVER (PARTITION BY s_nationkey) AS tot FROM s) "
            "SELECT s_suppkey, s_nationkey, acctbal_cents, "
            "CAST(CASE WHEN tot = 0 THEN 1000000 "
            "ELSE (1000000::HUGEINT * cum) // tot END AS BIGINT) "
            "AS cum_share_ppm, "
            "CASE WHEN (CASE WHEN tot = 0 THEN 1000000 "
            "ELSE (1000000::HUGEINT * cum) // tot END) < 700000 THEN 'A' "
            "WHEN (CASE WHEN tot = 0 THEN 1000000 "
            "ELSE (1000000::HUGEINT * cum) // tot END) < 900000 THEN 'B' "
            "ELSE 'C' END AS abc_class FROM c"
        ),
        "events_time_to_purchase": (
            "WITH f AS (SELECT event_id, user_id, "
            "min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) "
            "- epoch_us(ts) AS dt FROM events) "
            "SELECT event_id, user_id, CAST(dt AS BIGINT) AS us_to_purchase "
            "FROM f WHERE dt IS NOT NULL"
        ),
        "events_user_session_number": (
            "WITH f AS (SELECT event_id, user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
            "THEN 1 ELSE 0 END AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT event_id, user_id, "
            "CAST(sum(new_s) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS session_idx FROM f"
        ),
        "events_user_cumulative_distinct": (
            "WITH f AS (SELECT event_id, user_id, ts, "
            "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen "
            "FROM events) "
            "SELECT event_id, user_id, "
            "CAST(sum(first_seen) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS n_distinct_so_far FROM f"
        ),
        "events_value_cume_dist": (
            "SELECT event_id, event_type, "
            "CAST(round(value * 1000000) AS BIGINT) AS value_micro, "
            "CAST(count(*) OVER (PARTITION BY event_type "
            "ORDER BY CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS n_le, "
            "CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) "
            "AS n_total FROM events"
        ),
        "docs_partitioned_sink_roundtrip": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1"
        ),
        "docs_compacted_sink_roundtrip": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT)) "
            "AS BIGINT) AS sum_h FROM documents GROUP BY source"
        ),
        "docs_arrow_ipc_roundtrip": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1"
        ),
        "docs_jsonl_roundtrip": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY 1"
        ),
        "docs_webdataset_roundtrip": (
            # Full-row identity: the roundtrip must reconstruct every
            # document bit-exactly from the tar shards.
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        ),
        "docs_chunk_overlap": (
            r"WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks "
            "FROM documents), "
            "c AS (SELECT doc_id, toks, "
            "unnest(range(0, greatest(length(toks), 1), 24)) AS start "
            "FROM t) "
            "SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id, "
            "CAST(start AS BIGINT) AS start_tok, "
            "CAST(least(32, length(toks) - start) AS BIGINT) AS n_tokens, "
            "array_to_string(list_slice(toks, start + 1, start + 32), ' ') "
            "AS chunk_text "
            "FROM c WHERE start < length(toks)"
        ),
        "docs_gopher_quality_filter": (
            r"WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks "
            "FROM documents), "
            "m AS (SELECT doc_id, unnest(toks) AS tok FROM t), "
            "top AS (SELECT doc_id, max(c) AS top_cnt FROM "
            "(SELECT doc_id, tok, count(*) AS c FROM m GROUP BY 1, 2) "
            "GROUP BY 1), "
            "s AS (SELECT t.doc_id, length(t.toks) AS n_tok, "
            "COALESCE(list_sum(list_transform(t.toks, x -> length(x))), 0) "
            "AS sum_len, COALESCE(top.top_cnt, 0) AS top_cnt, "
            f"length(list_filter(t.toks, x -> x IN ({_STOP_LIST}))) AS stop_cnt "
            "FROM t LEFT JOIN top ON t.doc_id = top.doc_id) "
            "SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, "
            "CAST((1000 * sum_len) // greatest(n_tok, 1) AS BIGINT) "
            "AS mean_len_milli, "
            "CAST((1000000 * top_cnt) // greatest(n_tok, 1) AS BIGINT) "
            "AS top_tok_ppm, "
            "CAST((1000000 * stop_cnt) // greatest(n_tok, 1) AS BIGINT) "
            "AS stop_ppm, "
            "CAST(CASE WHEN n_tok >= 20 AND n_tok <= 100000 "
            "AND (1000 * sum_len) // greatest(n_tok, 1) BETWEEN 3000 AND 10000 "
            "AND (1000000 * top_cnt) // greatest(n_tok, 1) <= 200000 "
            "AND (1000000 * stop_cnt) // greatest(n_tok, 1) >= 10000 "
            "THEN 1 ELSE 0 END AS BIGINT) AS kept FROM s"
        ),
        "user_click_purchase_full_outer": (
            "WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events "
            "WHERE event_type = 'click' GROUP BY 1), "
            "p AS (SELECT user_id, count(*) AS n_purchases FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1) "
            "SELECT COALESCE(c.user_id, p.user_id) AS user_id, "
            "CAST(COALESCE(c.n_clicks, 0) AS BIGINT) AS n_clicks, "
            "CAST(COALESCE(p.n_purchases, 0) AS BIGINT) AS n_purchases "
            "FROM c FULL OUTER JOIN p ON c.user_id = p.user_id"
        ),
        "q6_forecast_revenue": (
            "SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice * l_discount "
            "* 1000000) AS BIGINT)), 0) AS BIGINT) AS revenue_micro, "
            "CAST(count(*) AS BIGINT) AS n_items FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND l_discount >= CAST(0.05 AS DOUBLE) "
            "AND l_discount <= CAST(0.07 AS DOUBLE) "
            "AND l_quantity < 24"
        ),
        "q7_nation_volume": (
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) "
            "* 1000000) AS BIGINT)) AS BIGINT) AS revenue_micro "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation ns ON s.s_nationkey = ns.n_nationkey "
            "JOIN nation nc ON c.c_nationkey = nc.n_nationkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7') "
            "OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')) "
            "GROUP BY 1, 2, 3"
        ),
        "q10_returned_customers": (
            "WITH rev AS (SELECT o.o_custkey, "
            "CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) "
            "* 1000000) AS BIGINT)) AS BIGINT) AS revenue_micro "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '1997-07-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-10-01' "
            "GROUP BY 1) "
            "SELECT c.c_custkey, c.c_name, n.n_name, r.revenue_micro "
            "FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "ORDER BY r.revenue_micro DESC, c.c_custkey LIMIT 20"
        ),
        "q12_priority_linestatus": (
            "SELECT l.l_linestatus, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1"
        ),
        "q14_promo_revenue": (
            "WITH j AS (SELECT CAST(round(l.l_extendedprice "
            "* (1 - l.l_discount) * 1000000) AS BIGINT) AS rev, p.p_type "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' "
            "AND l.l_shipdate < TIMESTAMP '1997-10-01') "
            "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) "
            "AS BIGINT) AS promo_revenue_micro, "
            "CAST(sum(rev) AS BIGINT) AS total_revenue_micro, "
            "CAST((1000000::HUGEINT * sum(CASE WHEN p_type = 'PROMO' "
            "THEN rev ELSE 0 END)) // sum(rev) AS BIGINT) AS promo_ppm "
            "FROM j"
        ),
        "q16_supplier_part_counts": (
            "SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size, "
            "CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_brand <> 'Brand#15' AND l.l_suppkey % 4 <> 0 "
            "GROUP BY 1, 2"
        ),
        "q19_disjunctive_revenue": (
            "SELECT CAST(COALESCE(sum(CAST(round(l.l_extendedprice "
            "* (1 - l.l_discount) * 1000000) AS BIGINT)), 0) AS BIGINT) "
            "AS revenue_micro, CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 "
            "AND l.l_quantity BETWEEN 1 AND 11) "
            "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 "
            "AND l.l_quantity BETWEEN 10 AND 20) "
            "OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 15 "
            "AND l.l_quantity BETWEEN 20 AND 30)"
        ),
        "q8_market_share": (
            "WITH j AS (SELECT CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) "
            "AS BIGINT) AS rev, "
            "CASE WHEN ns.n_name = 'NATION_3' THEN 1 ELSE 0 END AS tgt "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation nc ON c.c_nationkey = nc.n_nationkey "
            "JOIN region r ON nc.n_regionkey = r.r_regionkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation ns ON s.s_nationkey = ns.n_nationkey "
            "WHERE r.r_name = 'ASIA' "
            "AND l.l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01') "
            "SELECT l_year, CAST(sum(rev) AS BIGINT) AS rev_micro, "
            "CAST(sum(tgt * rev) AS BIGINT) AS rev_target_micro, "
            "CAST((1000000::HUGEINT * sum(tgt * rev)) // sum(rev) "
            "AS BIGINT) AS share_ppm "
            "FROM j GROUP BY 1"
        ),
        "docs_pii_scrub": (
            "WITH aug AS (SELECT doc_id, text || ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@example.org or call 555-' || "
            "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
            "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
            "CAST((doc_id // 256) % 256 AS VARCHAR) AS t FROM documents) "
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace(t, "
            f"'{text.PII_EMAIL_RE}', '<EMAIL>', 'g'), "
            f"'{text.PII_IPV4_RE}', '<IP>', 'g'), "
            f"'{text.PII_PHONE_RE}', '<PHONE>', 'g') AS redacted, "
            f"CAST(length(regexp_extract_all(t, '{text.PII_EMAIL_RE}')) "
            "AS BIGINT) AS n_emails, "
            f"CAST(length(regexp_extract_all(t, '{text.PII_PHONE_RE}')) "
            "AS BIGINT) AS n_phones, "
            f"CAST(length(regexp_extract_all(t, '{text.PII_IPV4_RE}')) "
            "AS BIGINT) AS n_ips FROM aug"
        ),
        "docs_extract_matches": (
            "WITH aug AS (SELECT doc_id, text || ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@example.org or call 555-' || "
            "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
            "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
            "CAST((doc_id // 256) % 256 AS VARCHAR) AS t FROM documents) "
            "SELECT doc_id, kind, matched FROM ("
            "SELECT doc_id, 'email' AS kind, "
            f"unnest(regexp_extract_all(t, '{text.PII_EMAIL_RE}')) "
            "AS matched FROM aug "
            "UNION ALL SELECT doc_id, 'phone', "
            f"unnest(regexp_extract_all(t, '{text.PII_PHONE_RE}')) FROM aug "
            "UNION ALL SELECT doc_id, 'ip', "
            f"unnest(regexp_extract_all(t, '{text.PII_IPV4_RE}')) FROM aug)"
        ),
        "docs_normalize_text": (
            "WITH n AS (SELECT doc_id, "
            r"trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) "
            "AS norm_text FROM documents) "
            "SELECT doc_id, norm_text, "
            "CAST(length(norm_text) AS BIGINT) AS n_chars FROM n"
        ),
        "q11_important_parts": (
            "WITH rev AS (SELECT l_partkey, "
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) "
            "* 1000000) AS BIGINT)) AS HUGEINT) AS r "
            "FROM lineitem GROUP BY 1), "
            "tot AS (SELECT sum(r) AS t FROM rev) "
            "SELECT CAST(l_partkey AS BIGINT) AS l_partkey, "
            "CAST(r AS BIGINT) AS revenue_micro FROM rev, tot "
            "WHERE r > (CAST(3 AS HUGEINT) * t) "
            "// (2 * (SELECT count(*) FROM part))"
        ),
        "q20_heavy_shippers": (
            "WITH typed AS (SELECT l.l_suppkey, l.l_partkey, l.l_quantity "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_type = 'PROMO' "
            "AND l.l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01'), "
            "pairs AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS q "
            "FROM typed GROUP BY 1, 2), "
            "winners AS (SELECT l_suppkey AS s_suppkey, "
            "CAST(count(*) AS BIGINT) AS n_heavy_parts "
            "FROM pairs WHERE q > 50 GROUP BY 1) "
            "SELECT w.s_suppkey, s.s_name, w.n_heavy_parts "
            "FROM winners w JOIN supplier s ON w.s_suppkey = s.s_suppkey"
        ),
        "q15_top_supplier": (
            "WITH rev AS (SELECT l_suppkey AS s_suppkey, "
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) "
            "* 1000000) AS BIGINT)) AS BIGINT) AS total_revenue_micro "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1) "
            "SELECT r.s_suppkey, s.s_name, r.total_revenue_micro "
            "FROM rev r JOIN supplier s ON r.s_suppkey = s.s_suppkey "
            "WHERE r.total_revenue_micro = "
            "(SELECT max(total_revenue_micro) FROM rev)"
        ),
        "q9_product_profit": (
            "WITH j AS (SELECT n.n_name AS nation, "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) "
            "AS BIGINT) - CAST(round(p.p_retailprice * l.l_quantity "
            "* 100000) AS BIGINT) AS profit "
            "FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "WHERE p.p_name LIKE '%red%') "
            "SELECT nation, o_year, CAST(sum(profit) AS BIGINT) "
            "AS profit_micro FROM j GROUP BY 1, 2"
        ),
        "q21_sole_returned_supplier": (
            "WITH ls AS (SELECT l_orderkey, l_suppkey, "
            "max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret "
            "FROM lineitem GROUP BY 1, 2), "
            "o AS (SELECT l_orderkey, count(*) AS n_supp, sum(ret) AS n_ret "
            "FROM ls GROUP BY 1) "
            "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM ls JOIN o ON ls.l_orderkey = o.l_orderkey "
            "JOIN supplier s ON ls.l_suppkey = s.s_suppkey "
            "WHERE ls.ret = 1 AND o.n_supp >= 2 AND o.n_ret = 1 "
            "GROUP BY 1"
        ),
        "q22_idle_balance_customers": (
            "WITH s AS (SELECT sum(cents) AS sum_cents, count(*) AS n_pos "
            "FROM (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents "
            "FROM customer) WHERE cents > 0) "
            "SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs, "
            "CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) "
            "AS acctbal_cents_total "
            "FROM customer c, s "
            "WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * s.n_pos "
            "> s.sum_cents "
            "AND c.c_custkey NOT IN (SELECT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2000-01-01') "
            "GROUP BY 1"
        ),
    }
