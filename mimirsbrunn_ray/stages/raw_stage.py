"""Fused raw-tier stage: validate + enrich + claim-dedup in ONE actor pool.

Each map_batches operator boundary materializes its output blocks in the
object store; for the raw tier that means shipping the full token payload
between three adjacent metadata-only stages. Fusing them into one pass cuts
object-store traffic from 4 block hops (read -> validate -> enrich -> claim
-> write) to 2, which matters on bandwidth-bound nodes. Semantics are the
composition of the three component stages (each individually unit-tested);
this class only sequences them per batch.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from mimirsbrunn_ray.sources.ingest import ValidateAndDerive
from mimirsbrunn_ray.stages.dedup import ClaimFilterStage
from mimirsbrunn_ray.stages.enrich import SourceDimEnricher


class RawTierStage:
    def __init__(self, counters=None, dim_ref=None, dup_ref=None, claimer=None,
                 key: str = "doc_id"):
        self.validate = ValidateAndDerive(counters=counters)
        self.enrich = SourceDimEnricher(dim_ref) if dim_ref is not None else None
        self.claim = (
            ClaimFilterStage(dup_ref, claimer, key, counters)
            if dup_ref is not None
            else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self.validate(batch)
        if self.enrich is not None:
            batch = self.enrich(batch)
        if self.claim is not None:
            batch = self.claim(batch)
        return batch


def raw_tier(
    ds: "rd.Dataset",
    counters=None,
    dim_ref=None,
    dup_hashes=None,
    key: str = "doc_id",
    concurrency=None,
) -> "rd.Dataset":
    import numpy as np
    import ray

    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.stages.dedup import ClaimActor

    dup_ref = None
    claimer = None
    if dup_hashes is not None:
        dup_ref = ray.put(np.sort(np.asarray(dup_hashes, dtype=np.int64)))
        claimer = ray.remote(num_cpus=0)(ClaimActor).remote()
    return ds.map_batches(
        RawTierStage,
        fn_constructor_kwargs={
            "counters": counters,
            "dim_ref": dim_ref,
            "dup_ref": dup_ref,
            "claimer": claimer,
            "key": key,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )