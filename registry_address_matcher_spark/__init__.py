"""registry_address_matcher_spark — a PySpark-native record-linkage engine.

A from-scratch re-realization of the capabilities of the reference
``fr44lancer/registry_address_matcher`` (a single-threaded pandas +
rapidfuzz entity-resolution app) as an idiomatic, cluster-scale Spark
pipeline:

* deterministic normalization as native Catalyst expressions (no per-row
  Python) — see :mod:`registry_address_matcher_spark.functions.normalize`
* hash-index blocking re-expressed as equi-joins with skew salting —
  :mod:`registry_address_matcher_spark.operators.blocking`
* exact + fuzzy matching phases as declarative DataFrame plans —
  :mod:`registry_address_matcher_spark.operators.exact` /
  :mod:`registry_address_matcher_spark.operators.fuzzy`
* batched Arrow pandas-UDF similarity kernels (rapidfuzz semantics,
  numpy/bit-parallel implementations) —
  :mod:`registry_address_matcher_spark.functions.similarity`
* transitive clustering via large-star/small-star connected components —
  :mod:`registry_address_matcher_spark.operators.cluster`
* training-data-pipeline operators (dedup, ANN, text analysis,
  multimodal plumbing) — :mod:`registry_address_matcher_spark.operators`
* lineage + metrics sidecar and stage checkpoint/resume —
  :mod:`registry_address_matcher_spark.plans`
"""

__version__ = "0.1.0"
