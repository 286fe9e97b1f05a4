"""Self-shipping: make `dashing_spark` importable on executor workers.

On a real cluster the package ships via ``spark-submit --py-files
dashing_spark.zip`` (north-rule deployment mode). When running ad hoc
(driver imports the package from a checkout), ``ensure_shipped`` builds
that same zip once and registers it with ``sc.addPyFile`` so executor
Python workers can unpickle our UDFs. Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[int] = set()


def package_zip_path() -> str:
    """Build (once) a py-files zip of the dashing_spark package."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(tempfile.gettempdir(), "dashing_spark_pyfiles.zip")
    src_mtime = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    )
    if os.path.exists(out) and os.path.getmtime(out) >= src_mtime:
        return out
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "dashing_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
    os.replace(tmp, out)
    return out


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    try:
        sc.addPyFile(package_zip_path())
    except Exception:
        # e.g. same zip added twice across sessions sharing a context
        pass
    _shipped.add(key)


def widen_if_narrow(df, target: int | None = None, max_bytes: int = 256 << 20):
    """Repartition a provably-SMALL DataFrame to cluster width before a
    per-partition Python kernel (mapInArrow/mapInPandas).

    A small parquet scan yields one or two input splits (128 MB
    maxPartitionBytes), so a heavyweight per-row kernel downstream runs
    on 1-2 cores while the rest of the cluster idles — measured 22 s
    for the per-doc joint-MLE containment pass on a 6 MB / 50k-doc
    scan that takes ~1.5 s at proper width. The decision reads the
    optimizer's size ESTIMATE (driver-side, no job): inputs above
    ``max_bytes`` are left exactly as planned — repartitioning a large
    scan would ADD a full shuffle of the payload, and a large scan is
    already wide. Kernels this guards are per-row pure, so row
    placement cannot change results. Streaming frames are returned
    unchanged (no estimate available mid-plan)."""
    if df.isStreaming:
        return df
    try:
        est = int(
            str(
                df._jdf.queryExecution()  # noqa: SLF001
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        )
    except Exception:
        return df
    if est > max_bytes:
        return df
    spark = df.sparkSession
    return df.repartition(target or spark.sparkContext.defaultParallelism * 2)
