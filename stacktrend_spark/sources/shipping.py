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

import hashlib
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
    # collect sources once; the cache key is a CONTENT hash, so a
    # recycled pid or an edited source tree can never ship a stale zip
    # (r8 review), and the unique tmp name + atomic replace make
    # concurrent builders race-safe (last writer wins, same bytes)
    sources: list[tuple[str, str]] = []
    digest = hashlib.md5()
    for dirpath, _dirnames, filenames in sorted(
        (d, dn, fn) for d, dn, fn in os.walk(pkg_dir)
    ):
        if "__pycache__" in dirpath:
            continue
        for fname in sorted(filenames):
            if fname.endswith(".py"):
                full = os.path.join(dirpath, fname)
                rel = os.path.relpath(full, base)
                sources.append((full, rel))
                digest.update(rel.encode())
                with open(full, "rb") as f:
                    digest.update(f.read())
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"stacktrend_spark_pyfiles_{digest.hexdigest()[:16]}.zip",
    )
    if not os.path.exists(zpath):
        fd, tmp = tempfile.mkstemp(
            suffix=".zip", dir=tempfile.gettempdir()
        )
        os.close(fd)
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for full, rel in sources:
                z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    _shipped.add(key)
