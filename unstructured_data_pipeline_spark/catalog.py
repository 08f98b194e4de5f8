"""Catalog bootstrap — the engine's equivalent of the reference's DDL.

The reference creates its five tables both in a setup script and idempotently
at app startup (`app/Auto-Magic Document AI.py:38-81`, `database/
setup_database.sql:46-90`); catalog/metadata scans (S4) are `SHOW`-style
queries.  Here: a warehouse directory of ParquetTables with CREATE IF NOT
EXISTS semantics, plus listing helpers over spark.catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from unstructured_data_pipeline_spark.operators.dml import ParquetTable
from unstructured_data_pipeline_spark.schemas import (
    PIPELINE_TABLES,
    VARIANT_NATIVE_CONF,
    pipeline_tables,
)


def bootstrap_warehouse(
    spark: SparkSession, root: str, variant_native: bool | None = None
) -> dict[str, ParquetTable]:
    """CREATE IF NOT EXISTS for all five pipeline tables (S8).

    ``variant_native=None`` reads the session conf
    ``spark.unstructured_data_pipeline.variantNative`` (default off): when
    on, the structured payload columns are stored as Spark-4 VariantType;
    writers hand the same JSON strings either way (ParquetTable converts at
    the boundary)."""
    if variant_native is None:
        variant_native = (
            str(spark.conf.get(VARIANT_NATIVE_CONF, "false")).lower() == "true"
        )
    return {
        name: ParquetTable(spark, root, name, schema).ensure()
        for name, schema in pipeline_tables(variant_native).items()
    }


def seed_invoice_prompts(spark: SparkSession, tables: dict[str, ParquetTable]) -> None:
    """Seed the `invoice` class iff absent (D2 anti-insert), mirroring the
    reference's static seed (`database/setup_database.sql:129-142`)."""
    from unstructured_data_pipeline_spark.functions.variant import canonical_json

    seed = {
        "invoice_number": "What is the invoice number?",
        "invoice_date": "What is the invoice date?",
        "due_date": "What is the payment due date?",
        "vendor_name": "What is the vendor or supplier name?",
        "vendor_address": "What is the vendor address?",
        "customer_name": "What is the customer name?",
        "total_amount": "What is the total amount due?",
        "tax_amount": "What is the tax amount?",
        "subtotal": "What is the subtotal before tax?",
        "payment_terms": "What are the payment terms?",
    }
    src = spark.createDataFrame(
        [("invoice", canonical_json(seed), None, None)],
        PIPELINE_TABLES["class_prompts"],
    )
    tables["class_prompts"].anti_insert(src, ["class_name"])


def list_tables(spark: SparkSession) -> DataFrame:
    """S4 catalog scan."""
    return spark.sql("SHOW TABLES")
