"""J2 ancestor-chain closure, prefix/fuzzy autocomplete, human sort, paging."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_ancestor_chain_ragged_depths(ray_session):
    """Roots, mid-level nodes, deep nodes and unknown parents in one batch
    (the cosmogony parent-walk semantics incl. orphan handling,
    /root/reference/src/admin_geofinder.rs:430-470 orphan test)."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.hierarchy import ancestor_chain

    # hierarchy: a -> b -> c (root); x -> ghost (unknown parent)
    edge_ids = ["a", "b", "c"]
    edge_parents = ["b", "c", None]
    rows = [
        {"node_id": "a", "parent_id": "b"},
        {"node_id": "b", "parent_id": "c"},
        {"node_id": "c", "parent_id": None},
        {"node_id": "x", "parent_id": "ghost"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = ancestor_chain(ds, edge_ids, edge_parents).to_pandas()
    got = {r.node_id: (r.chain, r.depth, r.root_id) for r in out.itertuples()}
    assert got["a"] == ("a/b/c", 3, "c")
    assert got["b"] == ("b/c", 2, "c")
    assert got["c"] == ("c", 1, "c")
    # unknown parent: chain stops at the dangling edge (orphan keeps it)
    assert got["x"] == ("x/ghost", 2, "ghost")


def test_ancestor_chain_cycle_is_cut(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.hierarchy import ancestor_chain

    ds = rd.from_arrow(
        pa.Table.from_pylist([{"node_id": "p", "parent_id": "q"}])
    )
    out = ancestor_chain(
        ds, ["p", "q"], ["q", "p"], max_depth=6
    ).to_pandas()
    assert out["depth"].iloc[0] == 7  # self + 6 capped levels, no hang


def test_autocomplete_prefix_then_fuzzy_fallback(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import autocomplete

    rows = [
        {"doc_id": 1, "text": "alpha beta gamma", "n_chars": 16},
        {"doc_id": 2, "text": "alpha delta", "n_chars": 11},
        {"doc_id": 3, "text": "beta gamma delta", "n_chars": 16},
        {"doc_id": 4, "text": "unrelated words here", "n_chars": 20},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))

    # pass 1 hits: prefix match only, importance-ordered
    out = autocomplete(ds, "alpha", k=10).to_pandas()
    assert out["doc_id"].tolist() == [1, 2]  # n_chars 16 > 11

    # a longer prefix still hits pass 1 (no fallback when hits exist)
    out = autocomplete(ds, "alpha beta gamm", k=10).to_pandas()
    assert out["doc_id"].tolist() == [1]

    # zero prefix hits -> trigram fuzzy fallback finds the close docs
    out = autocomplete(ds, "beta gamma alph", k=2).to_pandas()
    assert len(out) == 2
    assert out["doc_id"].iloc[0] in (1, 3)  # most trigram-similar wins
    assert 4 not in out["doc_id"].tolist()


def test_prefix_search_paging(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import prefix_search

    rows = [
        {"doc_id": i, "text": f"page test {i}", "n_chars": 100 - i}
        for i in range(8)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    p1 = prefix_search(ds, "page", k=3, offset=0).to_pandas()
    p2 = prefix_search(ds, "page", k=3, offset=3).to_pandas()
    assert p1["doc_id"].tolist() == [0, 1, 2]  # score = n_chars desc
    assert p2["doc_id"].tolist() == [3, 4, 5]


def test_human_sort():
    from mimirsbrunn_ray.functions.humansort import human_sorted

    # the ntfs2mimir line-sort semantics: "3" < "11", numbers before text
    assert human_sorted(["11", "3", "A1", "2B", "a"]) == [
        "2B", "3", "11", "A1", "a",
    ]
    assert human_sorted(["line10", "line2", "line1"]) == [
        "line1", "line2", "line10",
    ]


def test_topk_paging_offset(ray_session, tmp_path):
    import ray.data as rd

    from mimirsbrunn_ray import query
    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(str(tmp_path))
    tbl = pa.table(
        {
            "source": ["s"] * 6,
            "bucket": pa.array(
                np.arange(6) * 60_000_000, type=pa.timestamp("us")
            ),
            "sum_tok": pa.array([60, 50, 40, 30, 20, 10], type=pa.int64()),
            "n_rows": pa.array([1] * 6, type=pa.int64()),
            "filled": pa.array([False] * 6),
        }
    )
    store.publish(rd.from_arrow(tbl), "1m", "r0")
    page1 = query.top_k(store, k=2, offset=0)
    page2 = query.top_k(store, k=2, offset=2)
    assert page1["sum_tok"].tolist() == [60, 50]
    assert page2["sum_tok"].tolist() == [40, 30]


def test_dependency_closure_dag_and_cycle(ray_session):
    """Generic edge-set closure: multi-parent DAG with reconvergent paths
    counts each dep ONCE; cycles terminate via the visited filter (not
    max_depth); unknown nodes and dep-free nodes get 0."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.hierarchy import dependency_closure

    # DAG: 10 -> {5, 3}, 5 -> {2}, 3 -> {2}, 2 -> {1}  (2 and 1 reconverge)
    # cycle: 7 -> 8 -> 9 -> 7
    src = [10, 10, 5, 3, 2, 7, 8, 9]
    dst = [5, 3, 2, 2, 1, 8, 9, 7]
    ds = rd.from_arrow(
        pa.table({"node_id": pa.array([10, 5, 2, 1, 7, 999], pa.int64())})
    )
    out = (
        dependency_closure(ds, src, dst)
        .to_pandas()
        .set_index("node_id")
    )
    # closure(10) = {5, 3, 2, 1}
    assert out.loc[10, "n_deps"] == 4 and out.loc[10, "dep_sum"] == 11
    assert out.loc[5, "n_deps"] == 2 and out.loc[5, "dep_sum"] == 3
    assert out.loc[2, "n_deps"] == 1 and out.loc[2, "dep_sum"] == 1
    assert out.loc[1, "n_deps"] == 0
    # cycle member: closure(7) = {8, 9, 7} — includes itself via the cycle
    assert out.loc[7, "n_deps"] == 3 and out.loc[7, "dep_sum"] == 24
    assert out.loc[999, "n_deps"] == 0 and out.loc[999, "dep_sum"] == 0


def test_fuzzy_driver_query_fires_fallback(ray_session):
    """The driver's fuzzy_search_docs query really exercises the ZERO-hit
    prefix path: the typo'd query has no prefix matches, and the fuzzy
    pass returns k scored rows."""
    import ray.data as rd

    from mimirsbrunn_ray.pipelines.queries import _FUZZY_K, _FUZZY_QUERY
    from mimirsbrunn_ray.stages.search import prefix_search

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    assert prefix_search(docs, _FUZZY_QUERY).count() == 0

    from mimirsbrunn_ray.pipelines.queries import q_fuzzy_search_docs

    out = q_fuzzy_search_docs(sf).to_pandas()
    assert len(out) == _FUZZY_K
    assert (out["score"] > 0).all()


def test_grouped_top_k_matches_pandas(ray_session):
    """Per-group top-k vs pandas groupby/head: string keys, ties broken by
    id asc, groups smaller than k, and a group key absent in some batches
    (the partial prune must stay per-block-exact)."""
    import pandas as pd
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import grouped_top_k

    rng = np.random.default_rng(7)
    n = 5_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["en", "fr", "de", "zz_rare"], n, p=[0.5, 0.3, 0.199, 0.001]),
            "v": rng.integers(0, 50, n),  # heavy ties
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        grouped_top_k(ds, ["g"], "v", k=5, tiebreak_cols=["id"])
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g", sort=True)
        .head(5)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], want[["g", "v", "id"]])
    # the rare group has fewer rows than k and must survive whole
    assert (want.g == "zz_rare").sum() == (got.g == "zz_rare").sum()


def test_grouped_top_k_nan_group_keys(ray_session):
    """Float NaN group keys must form ONE group capped at k, not leak every
    NaN row at rank 0 (NaN != NaN is elementwise True)."""
    import pandas as pd
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import grouped_top_k

    df = pd.DataFrame(
        {
            "g": [1.0, 1.0, np.nan, np.nan, np.nan, np.nan, 2.0],
            "v": [5, 3, 9, 8, 7, 6, 1],
            "id": np.arange(7, dtype=np.int64),
        }
    )
    got = (
        grouped_top_k(rd.from_pandas(df), ["g"], "v", k=2, tiebreak_cols=["id"])
        .to_pandas()
    )
    nan_rows = got[got.g.isna()]
    assert len(nan_rows) == 2, nan_rows
    assert sorted(nan_rows.v) == [8, 9]
    assert len(got) == 5  # two from 1.0, two from NaN, one from 2.0


def test_synonym_expansion(ray_session):
    """Config-driven synonym table (rubber.rs:49-67 graft): the expanded
    variants match in BOTH passes, expansion caps the cartesian product,
    and whitespace-anchored prefixes survive expansion."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import expand_query, prefix_search

    syn = {"bd": ["boulevard"], "st": ["street", "saint"]}
    assert expand_query("bd ", syn) == ["bd ", "boulevard "]
    assert sorted(expand_query("bd st", syn)) == sorted(
        ["bd st", "bd street", "bd saint",
         "boulevard st", "boulevard street", "boulevard saint"]
    )
    assert expand_query("bd", None) == ["bd"]
    assert expand_query("", syn) == [""]

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "boulevard of dreams", "bd of dreams",
            "street fair", "avenue nowhere",
        ]),
        "n_chars": pa.array([19, 12, 11, 14], pa.int64()),
    }))
    hits = (
        prefix_search(docs, "bd", k=10, synonyms=syn)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert hits["doc_id"].tolist() == [1, 2]  # both variants matched
    # without synonyms only the literal prefix matches
    plain = prefix_search(docs, "bd", k=10).to_pandas()
    assert plain["doc_id"].tolist() == [2]


def test_fuzzy_debug_components(ray_session):
    """debug=True on the fuzzy pass emits the score breakdown and the
    components recompose the final score (explain-tree graft)."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import fuzzy_search

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["vector table scan", "merge join hash"]),
        "n_chars": pa.array([17, 15], pa.int64()),
    }))
    out = fuzzy_search(docs, "vectro table", k=5, debug=True).to_pandas()
    assert {"jaccard", "importance", "score"} <= set(out.columns)
    assert len(out) >= 1
    recomposed = (out["jaccard"] * out["importance"]).round(4)
    assert (abs(recomposed - out["score"].round(4)) <= 1e-3).all()
    # no debug -> schema unchanged (oracle stability)
    plain = fuzzy_search(docs, "vectro table", k=5).to_pandas()
    assert set(plain.columns) == {"doc_id", "score"}


def test_i18n_select_label_vectorized(ray_session):
    """select_label: stored variant wins, absent/redundant falls back to
    the default; build_names_map never stores redundant variants."""
    import pyarrow as pa

    from mimirsbrunn_ray.functions.i18n import build_names_map, select_label

    default = pa.array(["Paris", "Lyon", "Nice", "Metz"])
    fr = pa.array(["Paris-fr", "Lyon", None, "Metz-fr"])  # Lyon redundant
    de = pa.array([None, "Lyon-de", "Nice-de", None])
    names = build_names_map(default, {"fr": fr, "de": de})
    # redundant + null variants are not stored
    stored = names.to_pylist()
    assert ("fr", "Lyon") not in (stored[1] or [])
    got_fr = select_label(names, default, "fr").to_pylist()
    assert got_fr == ["Paris-fr", "Lyon", "Nice", "Metz-fr"]
    got_de = select_label(names, default, "de").to_pylist()
    assert got_de == ["Paris", "Lyon-de", "Nice-de", "Metz"]
    assert select_label(names, default, None).to_pylist() == default.to_pylist()
    # a lang nobody stores
    assert select_label(names, default, "zz").to_pylist() == default.to_pylist()


def test_grouped_rank_topk_ties(ray_session):
    """RANK/DENSE_RANK with heavy planted ties == DuckDB window output
    (randomized small-int values force tie runs across batch boundaries)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import grouped_rank_topk

    rng = np.random.default_rng(13)
    n = 600
    tbl = pa.table({
        "g": pa.array(rng.integers(0, 5, n).astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 6, n).astype(np.int64)),  # heavy ties
    })
    ds = rd.from_arrow(tbl).repartition(7)  # force cross-batch tie runs
    con = duckdb.connect()
    con.register("t", tbl)
    for method, fn in (("rank", "RANK()"), ("dense", "DENSE_RANK()")):
        got = (
            grouped_rank_topk(ds, ["g"], "v", k=2, method=method)
            .to_pandas()
            .sort_values(["g", "v", "id"], ignore_index=True)
        )
        want = con.sql(f"""
            WITH r AS (SELECT g, id, v,
                       {fn} OVER (PARTITION BY g ORDER BY v DESC) AS rnk
                       FROM t)
            SELECT g, id, v, CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 2 ORDER BY g, v, id
        """).df()
        assert got[["g", "id", "v", "rnk"]].astype("int64").equals(
            want.astype("int64")
        ), method
        assert (got["rnk"] <= 2).all() and len(got) > 10


def test_grouped_topk_bucketed_matches_direct(ray_session):
    """num_buckets (coarse hash buckets for high-cardinality group keys)
    never changes output for either top-k flavor."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.search import grouped_rank_topk, grouped_top_k

    rng = np.random.default_rng(21)
    n = 800
    tbl = pa.table({
        "g": pa.array(rng.integers(0, 200, n).astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 50, n).astype(np.int64)),
    })
    ds = rd.from_arrow(tbl).repartition(6)

    def canon(d):
        return d.to_pandas().sort_values(
            ["g", "id"], ignore_index=True
        )

    a = canon(grouped_top_k(ds, ["g"], "v", k=2, tiebreak_cols=("id",)))
    b = canon(grouped_top_k(ds, ["g"], "v", k=2, tiebreak_cols=("id",),
                            num_buckets=16))
    pd.testing.assert_frame_equal(a, b)
    c = canon(grouped_rank_topk(ds, ["g"], "v", k=2))
    d = canon(grouped_rank_topk(ds, ["g"], "v", k=2, num_buckets=16))
    pd.testing.assert_frame_equal(c, d)
    assert len(a) > 100 and len(c) >= len(a)


def test_expand_query_preserves_original_whitespace():
    """Review fix: the identity variant must be the ORIGINAL query string
    — rejoining with single spaces silently broke multi-space prefixes."""
    from mimirsbrunn_ray.stages.search import expand_query

    syn = {"bd": ["boulevard"]}
    got = expand_query("foo  bar", syn)  # no synonym applies
    assert got[0] == "foo  bar"
    got2 = expand_query("bd  x", syn)
    assert got2[0] == "bd  x" and "boulevard x" in got2


def test_select_label_sliced_map_array():
    """Review fix: flat map children span the WHOLE parent on a sliced
    view; out-of-view hits must not mis-assign labels or crash."""
    import pyarrow as pa

    from mimirsbrunn_ray.functions.i18n import build_names_map, select_label

    default = pa.array(["A", "B", "C", "D"])
    fr = pa.array(["A-fr", None, "C-fr", "D-fr"])
    names = build_names_map(default, {"fr": fr})
    sl_names = names.slice(1, 2)          # rows B, C
    sl_default = default.slice(1, 2)
    got = select_label(sl_names, sl_default, "fr").to_pylist()
    assert got == ["B", "C-fr"]  # A-fr (before view) and D-fr (after) excluded
