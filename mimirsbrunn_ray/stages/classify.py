"""Config-driven rule classifier — the POI type matcher graft.

The reference classifies POIs with pure-data rules: the FIRST rule whose
osm_tags_filters ALL match wins, and the config is validated up front
(unique type ids, rules reference declared types —
/root/reference/src/osm_reader/poi.rs:77-120). Here rules are a list of

    {"category": str, "all": [{"col": c, "op": "==|!=|<|<=|>|>=|in", "value": v}]}

evaluated vectorized per batch (pyarrow.compute masks), first match wins,
fallback category for unmatched rows. The rule table is plain data —
broadcastable, user-extensible (SURVEY.md §2.12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def validate_rules(rules: list, fallback: str) -> None:
    """Fail fast on malformed configs (the reference's check_config)."""
    seen = set()
    for r in rules:
        if "category" not in r or not r.get("all"):
            raise ValueError(f"rule missing category/conditions: {r}")
        if r["category"] in seen:
            raise ValueError(f"duplicate rule category: {r['category']}")
        seen.add(r["category"])
        for cond in r["all"]:
            if cond.get("op") not in (*_OPS, "in"):
                raise ValueError(f"unknown op in rule {r['category']}: {cond}")
    if fallback in seen:
        raise ValueError(f"fallback {fallback!r} collides with a rule category")


def classify(
    ds: "rd.Dataset",
    rules: list,
    fallback: str = "other",
    out_col: str = "category",
) -> "rd.Dataset":
    validate_rules(rules, fallback)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = np.full(n, fallback, dtype=object)
        assigned = np.zeros(n, dtype=bool)
        for rule in rules:
            mask = np.ones(n, dtype=bool)
            for cond in rule["all"]:
                col = batch[cond["col"]]
                if cond["op"] == "in":
                    m = pc.is_in(col, value_set=pa.array(cond["value"]))
                else:
                    m = _OPS[cond["op"]](col, pa.scalar(cond["value"]))
                mask &= pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            take = mask & ~assigned  # FIRST matching rule wins
            out[take] = rule["category"]
            assigned |= take
        return batch.append_column(out_col, pa.array(out, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def keys_with_all_categories(
    ds: "rd.Dataset",
    key: str,
    cat_col: str,
    required: list,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Keys whose category set covers ALL of ``required`` — the INTERSECT
    of per-category key sets (SQL: INTERSECT of SELECT DISTINCT key WHERE
    cat = c), computed as one pass + one shuffle instead of |required|
    separate scans.

    Shape: per-batch distinct (key, category) pairs restricted to the
    required set (combiner-first: the shuffle moves distinct pairs per
    block), ONE hash shuffle on the key bucket, then a vectorized
    per-bucket distinct + per-key category count — a key qualifies iff
    its distinct required-category count equals |required|. Output: one
    ``key`` column, each qualifying key exactly once.
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    # dedup while preserving order: a repeated entry would make the
    # distinct-count == len(req) test unsatisfiable and silently empty
    # the result
    req = list(dict.fromkeys(required))

    def pair_partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(b[key]),
            pc.fill_null(pc.is_in(b[cat_col], value_set=pa.array(req)), False),
        )
        b = b.filter(keep)
        return b.select([key, cat_col]).group_by([key, cat_col]).aggregate([])

    pairs = ds.map_batches(
        pair_partial, batch_format="pyarrow", batch_size=None
    ).map_batches(
        lambda b: add_bucket(b, key, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.drop_columns([_BUCKET])
        if t.num_rows == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type)})
        d = t.group_by([key, cat_col]).aggregate([])
        c = d.group_by([key]).aggregate([([], "count_all")])
        full = c.filter(pc.equal(c["count_all"], len(req)))
        return full.select([key])

    return pairs.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pyarrow"
    )
