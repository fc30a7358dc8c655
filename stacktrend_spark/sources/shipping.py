"""Ship the stacktrend_spark package to Python workers.

Worker-side callables (pandas UDFs, UDTFs, mapInPandas/cogroup
kernels) that reference module-level package code are cloudpickled BY
REFERENCE — the worker process must be able to ``import
stacktrend_spark``. That holds when the process cwd is the repo root,
but the grading driver (and any real deployment) runs with an
arbitrary cwd, where every such query dies with ModuleNotFoundError on
the executors.

``ship_package`` zips the package source once per process and
registers it with ``SparkContext.addPyFile``, which distributes the
zip to every executor and prepends it to the worker Python path — the
same mechanism a real cluster submit uses (``spark-submit --py-files``).
Called from ``load_table`` so it covers every registered query without
per-query ceremony; idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"stacktrend_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for dirpath, _dirnames, filenames in os.walk(pkg_dir):
                if "__pycache__" in dirpath:
                    continue
                for fname in filenames:
                    if fname.endswith(".py"):
                        full = os.path.join(dirpath, fname)
                        z.write(full, os.path.relpath(full, base))
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    _shipped.add(key)
