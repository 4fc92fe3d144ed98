"""rsyslog_ray — a Ray-Data-native log/transcript parse→enrich→route→aggregate engine.

A from-scratch reimplementation of the data-processing capabilities of
rsyslog (reference: /root/reference) on ray.data.Dataset + Apache Arrow:

- vectorized RFC5424 / RFC3164 / CEE parse cascade (``stages/parse.py``)
- RainerScript-style scalar function library as Arrow kernels (``functions.py``)
- property-filter / expression compiler → columnar predicate masks (``expr.py``)
- template compiler (property-replacer subset) → rendered string column
  (``templates.py``)
- lookup-table (broadcast dict) enrichment on actor pools (``stages/enrich.py``)
- multi-sink fan-out routing with per-partition atomic Parquet commits and a
  lineage manifest for checkpoint/resume (``stages/route.py``, ``state/``)
- aggregations with partial (combiner) pre-aggregation before the shuffle
  (``stages/aggregate.py``)
- training-data extras: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), text quality stats, ANN similarity search, multimodal plumbing
  (``stages/dedup.py`` etc.)

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by bench.py / the CLI / the pytest fixture.
"""

__version__ = "0.1.0"
