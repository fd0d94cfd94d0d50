"""SparkSession factory + package shipping for UDF workers.

Local-mode tuning per the scale design (SURVEY.md §4): AQE on (runtime
re-plan + skew-join split), shuffle partitions sized to cores (not the
200 default), Arrow enabled for all pandas UDF stages. On a real cluster
the same factory applies — only master/memory change.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_PKG_DIR = Path(__file__).resolve().parent


def build_pkg_zip() -> str:
    """Zip the esgkg package so spark.sparkContext.addPyFile can ship it to
    python workers (cloudpickle references module functions by name, so
    workers must be able to ``import esgkg``). The archive name is
    content-addressed so re-adding after a source change never collides
    with a previously registered file (e.g. one shipped via
    ``spark-submit --py-files``)."""
    import hashlib

    blobs = []
    for p in sorted(_PKG_DIR.rglob("*.py")):
        blobs.append((f"esgkg/{p.relative_to(_PKG_DIR)}", p.read_bytes()))
    digest = hashlib.blake2b(
        b"".join(name.encode() + b for name, b in blobs), digest_size=8
    ).hexdigest()
    path = f"/tmp/esgkg_pyfiles_{digest}.zip"
    if not Path(path).exists():
        with zipfile.ZipFile(path, "w") as zf:
            for name, data in blobs:
                zf.writestr(name, data)
    return path


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently attach the esgkg package to this session's workers."""
    sc = spark.sparkContext
    if getattr(sc, "_esgkg_shipped", False):
        return
    sc.addPyFile(build_pkg_zip())
    sc._esgkg_shipped = True


def get_spark(
    cores: int | None = None,
    app: str = "esgkg",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64m coalesces mid-size shuffles (e.g. the 700MB edge
        # groupBy) to fewer partitions than cores — 16m keeps all cores fed
        # while still bounding tiny-stage task counts via minPartitionSize
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("ESGKG_ARROW_BATCH", "2048"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: every block is process-local, so any locality wait is
        # pure scheduler stall — measured 3x slowdown on cached/checkpointed
        # lineages at local[32] with the 3s default
        .config("spark.locality.wait", "0")
        # RAM-backed shuffle/checkpoint scratch when available (local mode;
        # on a cluster this is the NVMe-backed spark.local.dir per node)
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local"
            if os.path.isdir("/dev/shm")
            else "/tmp/spark-local",
        )
        .config("spark.driver.memory", os.environ.get("ESGKG_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_shipped(spark)
    return spark
