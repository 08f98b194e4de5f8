"""Self-distribution: make this package importable on executor Python workers.

The driver process imports us by file path, but pandas UDFs are cloudpickled
*by reference* to this package — executor workers must be able to
``import unstructured_data_pipeline_spark`` themselves.  On a real cluster
you'd ``--py-files`` the wheel; here we do the equivalent at runtime:
zip the package and ``addPyFile`` it once per SparkContext.
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = pathlib.Path(__file__).resolve().parent
    zip_path = os.path.join(
        tempfile.gettempdir(), f"udp_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as z:
            for p in sorted(pkg_dir.rglob("*.py")):
                z.write(p, arcname=str(pathlib.Path(pkg_dir.name) / p.relative_to(pkg_dir)))
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
