"""mimirsbrunn_ray — a Ray-Data-native time-series rollup + downsample +
retention engine over Parquet tables of pre-tokenized training sequences.

Grafts the pipeline semantics of the reference geocoding importer
(antoine-de/mimirsbrunn: streaming ingest -> per-record enrichment ->
broadcast dimension lookup -> weight normalization -> dedup/merge ->
atomic tiered publish with zero-downtime alias swap -> query layer;
see /root/reference, cited per-module) onto hierarchical continuous
aggregates (raw -> 1m -> 1h -> 1d), gap-fill, Gorilla/delta-of-delta
compression, salted partitioning and resumable manifest checkpoints —
all expressed as ray.data.Dataset pipelines over zero-copy Arrow
batches.

Nothing in this package calls ray.init()/ray.shutdown(); sessions are
owned by the caller (driver, bench.py, CLI, test fixture).
"""

__version__ = "0.1.0"

from mimirsbrunn_ray import schemas  # noqa: F401
