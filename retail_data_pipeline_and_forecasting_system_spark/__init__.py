"""PySpark-native retail analytics + forecasting engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (sidpatondikar/Retail-Data-Pipeline-and-Forecasting-System):
ingest dimension/master data and daily nested-JSON transaction logs, process
orders against a mutable inventory with greedy cancellation-on-stockout,
derive orders / order-line-items / daily-summary / updated-inventory outputs,
and forecast next-day sales and profit — plus the large-scale data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).

Everything is declared with the DataFrame API so Catalyst plans the physical
execution; the only imperative kernel is the greedy inventory fold, shipped
as an `applyInPandas` grouped-map operator (see operators/depletion.py).
"""

__version__ = "0.1.0"
