"""Pinned schemas.

The reference lets dbt's agate CSV inference pick seed types
(/root/reference/dbt_project.yml:9 + README.md:46-49); at 100 TB scale
inference is nondeterministic and a full-file scan, so seeds get
explicit StructTypes (SURVEY §1.2). Model output schemas stay derived —
Catalyst infers them from the plan exactly as a warehouse derives a
SELECT's types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# /root/reference/seeds/raw_customers.csv (ERD: etc/dbdiagram_definition.txt:15-19)
RAW_CUSTOMERS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
    ]
)

# /root/reference/seeds/raw_orders.csv (ERD: etc/dbdiagram_definition.txt:1-7)
RAW_ORDERS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("order_date", T.DateType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

# /root/reference/seeds/raw_payments.csv (ERD: etc/dbdiagram_definition.txt:8-13;
# amount is cents — converted to dollars in stg_payments, SURVEY §1.3)
RAW_PAYMENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("order_id", T.LongType(), True),
        T.StructField("payment_method", T.StringType(), True),
        T.StructField("amount", T.LongType(), True),
    ]
)

SEED_SCHEMAS: dict[str, T.StructType] = {
    "raw_customers": RAW_CUSTOMERS,
    "raw_orders": RAW_ORDERS,
    "raw_payments": RAW_PAYMENTS,
}
