"""Airflow DAG artifact for the staged pipeline — the reference's
orchestration surface, emitted as a real ``DAG`` object.

The reference wires ingest -> process -> report as three
``PythonOperator`` tasks with a linear dependency chain (reference
src/candy_store_dag.py:228-248), each task opening its own SparkSession
and handing state to the next through files. ``plans/staged.py`` holds
the actual work (same three-task topology, date-partitioned parquet
handoff instead of lexicographically sorted part files); this module
only WIRES it, so the DAG file stays a thin scheduling shell — the
Airflow-recommended shape — and the stages remain runnable without
Airflow (tests drive ``run_staged_pipeline`` directly).

Import-guarded: importing this module without airflow installed yields
``dag = None`` instead of an ImportError, so the package (and pytest)
never depends on airflow. Configuration comes from environment
variables, mirroring the reference's dotenv-based ``load_config``
(src/candy_store_dag.py:36-55):

- ``RETAIL_CUSTOMERS_CSV``    path to customers.csv
- ``RETAIL_PRODUCTS_CSV``     path to products.csv
- ``RETAIL_TRANSACTIONS_GLOB`` glob of transactions_*.json
- ``RETAIL_LAKE_DIR``         parquet handoff root (shared by the tasks)
- ``RETAIL_OUTPUT_DIR``       final CSV directory

Each task builds a fresh local SparkSession (Airflow tasks are separate
worker processes — session state cannot be shared, which is also why the
handoff is files, exactly as in the reference) and stops it on exit.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - exercised only where airflow is installed
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.operators.python import PythonOperator

    _AIRFLOW = True
except Exception:  # airflow absent: expose dag=None, keep imports working
    _AIRFLOW = False

__all__ = ["dag", "task_ingest", "task_process", "task_report"]


def _config() -> dict[str, str]:
    return {
        "customers_csv": os.environ["RETAIL_CUSTOMERS_CSV"],
        "products_csv": os.environ["RETAIL_PRODUCTS_CSV"],
        "transactions_glob": os.environ["RETAIL_TRANSACTIONS_GLOB"],
        "lake_dir": os.environ["RETAIL_LAKE_DIR"],
        "output_dir": os.environ["RETAIL_OUTPUT_DIR"],
    }


def _session():
    from ..session import get_session

    return get_session("retail_staged_dag")


def task_ingest() -> None:
    """Raw sources -> lake parquet (reference DAG task 1)."""
    from .staged import stage_ingest

    cfg = _config()
    spark = _session()
    try:
        stage_ingest(
            spark,
            cfg["customers_csv"],
            cfg["products_csv"],
            cfg["transactions_glob"],
            cfg["lake_dir"],
        )
    finally:
        spark.stop()


def task_process() -> None:
    """Lake -> orders / lines / summary / inventory (reference task 2)."""
    from .staged import stage_process

    cfg = _config()
    spark = _session()
    try:
        stage_process(spark, cfg["lake_dir"])
    finally:
        spark.stop()


def task_report() -> None:
    """Lake -> contract CSVs + forecast (reference task 3)."""
    from .staged import stage_report

    cfg = _config()
    spark = _session()
    try:
        stage_report(spark, cfg["lake_dir"], cfg["output_dir"])
    finally:
        spark.stop()


if _AIRFLOW:
    default_args = {
        "owner": "airflow",
        "depends_on_past": False,
        "start_date": datetime(2024, 3, 1),
        "email_on_failure": False,
        "email_on_retry": False,
        "retries": 1,
        "retry_delay": timedelta(minutes=5),
    }

    dag = DAG(
        "retail_staged_etl",
        default_args=default_args,
        description="Retail order processing and forecasting (staged)",
        schedule_interval=None,
        catchup=False,
        tags=["retail"],
    )

    ingest_task = PythonOperator(
        task_id="ingest", python_callable=task_ingest, dag=dag
    )
    process_task = PythonOperator(
        task_id="process", python_callable=task_process, dag=dag
    )
    report_task = PythonOperator(
        task_id="report", python_callable=task_report, dag=dag
    )

    ingest_task >> process_task >> report_task
else:
    dag = None
