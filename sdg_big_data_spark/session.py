"""SparkSession factory with the engine's standard configuration.

The reference hard-fails on non-UTC sessions
(`gps-analytics/src/pipeline/geocode_stop_locations.scala:19`); we enforce
UTC at construction. AQE is enabled so shuffle widths self-tune at scale
(the reference hand-set ``spark.sql.shuffle.partitions = 1500`` on its
cluster — `gps-analytics/src/analysis/migration_flows.ipynb` cell 1); on a
real cluster AQE coalescing + skew-join handling replace that hand-tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_mem(cpus) -> str:
    """Local-mode driver heap sized to the task-slot count.

    In ``local[N]`` the driver JVM *is* the whole cluster: N concurrent
    tasks share one heap, so a cluster-driver constant (8g) starves the
    executors' working set — measured on the 32-slot bench box as 2.5x
    wall inflation from GC pressure (6-query probe: 28 s @ 8g vs 11 s @
    24g, reproduced twice each; OPTIMIZATION_r10.md has the table).
    ~0.75 GB per slot, floor 8 GB (the old constant — low-core runs are
    unchanged), capped at 30% of machine RAM so small boxes still start.
    On a real cluster the driver does no data work and executor memory
    is sized by the deployment (SPARK_GRAFT_EXTRA_CONF seam); this
    default only applies to local masters and is overridden by
    SPARK_GRAFT_DRIVER_MEM either way.
    """
    try:
        cpus = int(cpus)
    except (TypeError, ValueError):  # e.g. SPARK_GRAFT_CPUS="*" (local[*])
        cpus = os.cpu_count() or 8
    try:
        total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / (
            1024.0**3
        )
    except (ValueError, OSError, AttributeError):
        total_gb = 16.0
    gb = max(8, int(cpus * 0.75))
    gb = min(gb, max(8, int(total_gb * 0.30)))
    return f"{gb}g"


def ship_package(spark: SparkSession) -> None:
    """Make ``sdg_big_data_spark`` importable on executors via
    ``sc.addPyFile`` — the standard Spark deployment path for Python
    dependencies (same mechanism whether executors are local threads or
    1000 remote JVMs).

    Needed because pandas-UDF closures reference module-level helpers,
    which cloudpickle serializes *by name*: the worker must import the
    package, and the driver's ``sys.path`` does not propagate. Idempotent
    per SparkContext; called lazily by every UDF-backed operator and by
    ``read_table``.
    """
    sc = spark.sparkContext
    if getattr(sc, "_sdg_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo_root, "sdg_big_data_spark")
    zpath = os.path.join(
        tempfile.gettempdir(), f"sdg_big_data_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo_root))
    sc.addPyFile(zpath)
    sc._sdg_pkg_shipped = True


def get_spark(
    app_name: str = "sdg-big-data-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the standard SparkSession.

    Scale notes: every setting here is chosen for a multi-executor cluster,
    not just local mode —

    - ``spark.sql.adaptive.enabled`` + ``coalescePartitions`` +
      ``skewJoin``: runtime re-planning; replaces hand-set shuffle widths
      and manual salting for moderately skewed keys.
    - ``spark.sql.session.timeZone=UTC``: epoch/timestamp discipline.
    - Arrow on: every pandas-UDF boundary is Arrow-batched.
    - ``spark.sql.files.maxPartitionBytes=128m``: bounded scan partitions so
      a 100 TB read fans out to ~800k tasks instead of OOM-sized splits.
    - ``parquet.aggregatePushdown``: MIN/MAX/COUNT served from footer stats.
    - Runtime bloom-filter join pruning
      (``spark.sql.optimizer.runtime.bloomFilter.enabled``) is ON by
      Spark 4 default and deliberately left alone: a selective dim-side
      filter injects a bloom prefilter into the fact-side scan of
      shuffle joins (creation side ≤ 10 MB, probe scan ≥ 10 GB — i.e.
      exactly the 100 TB shapes, never the local fixtures), which is the
      idiomatic form of a hand-built bloom semi-join operator.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM")
            or (
                _default_driver_mem(cpus)
                if (master or f"local[{cpus}]").startswith("local")
                else "8g"
            ),
        )
        # ContextCleaner reclaims shuffle files / broadcasts only via GC'd
        # weak refs; the 30 min default lets a long-lived session (resident
        # service, notebook, bench) accumulate them — measured as +40-70%
        # per-query latency by the tail of a 57-query run. 1 min is the
        # standard long-running-driver setting.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # The whole-stage-codegen class cache holds 100 compiled plans by
        # default; a workload cycling through >100 distinct queries (the
        # 145-entry catalog bench, a resident multi-tenant SQL service)
        # recompiles EVERY plan on EVERY revisit once the LRU wraps —
        # measured as 20-50% per-query inflation on the full-catalog run
        # vs a 61-query run. Generated classes are KBs; 2000 entries is
        # noise next to the driver heap.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # Status-store retention (r10): the SQL listener keeps the last
        # 1000 executions' full metric/plan graphs and the app listener
        # the last 1000 jobs/stages ON HEAP even with the UI disabled —
        # a resident session cycling hundreds of distinct multi-stage
        # queries accumulates hundreds of MB of dead bookkeeping that
        # old-gen GC then walks every cycle. A service that wants
        # debuggability can raise these via SPARK_GRAFT_EXTRA_CONF;
        # the engine only needs enough history for the live query.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "20000")
        .config("spark.ui.enabled", "false")
    )
    if (master or f"local[{cpus}]").startswith("local"):
        # Fixed-size heap (-Xms = -Xmx): G1 on a growable heap re-sizes
        # regions/generations as the session's query mix shifts, and the
        # resize trajectory made identical queries measure 2-3x apart
        # between sessions on the 32-slot bench box. A fixed heap removes
        # that degree of freedom (standard long-running-service JVM
        # practice). extraJavaOptions may not carry -Xmx, but -Xms is
        # explicitly allowed; SPARK_GRAFT_EXTRA_CONF still overrides.
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM') or _default_driver_mem(cpus)}",
        )
    # Operator-supplied overrides, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd;spark.foo=bar"
    # — the deployment seam for cluster-specific tuning (the reference
    # hand-set its cluster's shuffle width the same way, in code); lets the
    # same engine run the committed defaults locally and measured
    # production values on a real cluster without a code fork.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in env_conf.split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
