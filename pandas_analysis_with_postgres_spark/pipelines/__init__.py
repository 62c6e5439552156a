"""End-to-end pipelines composed from the operator library.

``customer_dim`` is the full reference workload — the 16-stage
customer-dimension ETL (reference ``dmCustomerProc.py`` SQL-1…SQL-16)
re-expressed as one lazy Spark plan per output table.
"""

from .customer_dim import TOPIC_FLAGS, build_wide_customer, run_customer_pipeline

__all__ = ["build_wide_customer", "run_customer_pipeline", "TOPIC_FLAGS"]
