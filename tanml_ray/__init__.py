"""tanml_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimplementation of the *semantics* of tdlabs-ai/tanml
(profiling, data-quality constraints, PSI/KS drift, correlation/VIF,
model metrics) re-expressed as streaming, mergeable computation over
``ray.data.Dataset`` pipelines of zero-copy Arrow batches, plus the
large-scale training-data operators (dedup, similarity search, text
analysis) such an engine needs at 10^12-row scale.

Layout:
  kernels/    pure Arrow/numpy mergeable accumulators (no Ray)
  stages/     map_batches stage functions / actor classes
  pipelines/  composed validation / drift / dedup pipelines
  sources/    readers + fixture synthesis (pages table)
  functions/  scalar/vector helpers shared by stages
  state/      checkpoint manifest + resume logic
"""

__version__ = "0.1.0"
