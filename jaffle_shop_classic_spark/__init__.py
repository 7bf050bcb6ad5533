"""jaffle_shop_classic_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference dbt project
(dbt-labs/jaffle-shop-classic, see /root/reference) as an idiomatic
PySpark engine: a model registry + DAG runner over DataFrame-built
models, a declarative data-test framework, and a scale-out extension
operator library (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB-class inputs.

Layout:
  session.py    SparkSession factory (AQE on, UTC, tuned shuffles)
  schemas.py    pinned StructTypes for seeds and driver test tables
  sources/      seed (CSV) and parquet loaders
  plans/        model registry, DAG topo-runner, materializations, docs
  models/       the jaffle staging + mart models as DataFrame builders
  testing/      unique / not_null / accepted_values / relationships
  operators/    relational + extension operator catalog (driver queries)
  functions/    reusable column-expression helpers (vector math, hashing)
  streaming/    Structured Streaming variants of the windowed operators
"""

__version__ = "0.1.0"
