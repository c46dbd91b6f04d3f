"""video_features_spark — a PySpark-native point-in-time feature-engineering engine.

Brand-new engine with the query/data-processing capabilities of the reference
``v-iashin/video_features`` (studied read-only at ``/root/reference``), re-expressed
Spark-first: the DataFrame API is the query language, Catalyst is the optimizer,
Arrow-vectorized pandas UDFs are the only Python hot path.

Subpackages
-----------
- ``functions``  : scalar/vectorized kernels (codec, preprocess, embed, text)
- ``operators``  : relational/temporal operators (as-of join, windows, dedup,
                   similarity, stats)
- ``sources``    : table loaders, deterministic synthetic data generator,
                   checkpoint/lineage manifests
- ``plans``      : job specs + plan-inspection helpers
- ``streaming``  : structured-streaming variants of the stateful operators
"""

__version__ = "0.1.0"
