"""hastl_spark — PySpark-native time-series rollup + downsample + retention
engine with STL gap-fill (reference semantics: mortvest/hastl).

Layout:
  kernel/     pure-NumPy STL/LOESS math (oracle + UDF kernel)
  operators/  rollup, densify, gapfill, gorilla, merge, dedup, similarity, text
  sources/    synthetic sequences generator, parquet/iceberg table layer
  plans/      end-to-end pipeline drivers with checkpoint/lineage
  streaming/  incremental (structured-streaming) variants
"""

__version__ = "0.1.0"
