"""Infrastructure preflight checks (S9).

The Spark analog of the reference's ``check_infrastructure`` gate
(reference: src/cocosearch/indexer/preflight.py:22-105 — verify the DB is
reachable, extensions installed, model available BEFORE starting a long
index run, and fail with actionable messages instead of mid-run). Here the
infrastructure is the Spark session + the filesystem:

- the session is alive and can run a trivial job;
- Arrow transfer is enabled (every Python crossing in this engine is
  Arrow-batched — a silent fallback to pickle serde would be a 10-100×
  regression, so it is a preflight FAILURE, not a warning);
- every input path exists and is readable;
- the output / state directories are writable (probed by creating them and
  touching a marker file);
- the shuffle-partition setting is sane (>0).

``run_preflight`` returns all check rows; ``preflight_or_raise`` raises
RuntimeError listing every failure at once (the reference collects all
failures before raising, preflight.py:96-105 — one round trip for the
operator, not a whack-a-mole loop).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession


def _input_readable(spark: SparkSession, p: str) -> tuple[bool, str]:
    """Scheme-aware existence probe (ADVICE r3: os.path only understands
    driver-local paths — an hdfs:// or s3a:// input would always 'fail'
    preflight even when perfectly readable by Spark). Local/file: paths use
    os checks; any other scheme is probed through the same Hadoop
    FileSystem Spark's readers will use."""
    from urllib.parse import urlparse

    parsed = urlparse(p)
    scheme = parsed.scheme
    if scheme in ("", "file"):
        # ADVICE r4: use urlparse's PATH component — naive prefix stripping
        # turned authority-form URIs ('file://localhost/x') into relative
        # paths ('localhost/x'). Local authorities ('', 'localhost') are
        # valid; anything else is a remote file URI this driver cannot stat.
        if scheme == "file" and parsed.netloc not in ("", "localhost"):
            return False, f"non-local file URI authority {parsed.netloc!r}"
        local = parsed.path if scheme == "file" else p
        ok = os.path.exists(local) and os.access(local, os.R_OK)
        return ok, "readable" if ok else "missing or unreadable"
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        ok = bool(fs.exists(jpath))
        return ok, f"readable via {scheme}" if ok else f"missing on {scheme}"
    except Exception as e:
        # unknown scheme / connector not on the classpath — an actionable
        # preflight failure, not a crash
        return False, f"filesystem probe failed for scheme {scheme!r}: {e}"


def run_preflight(
    spark: SparkSession,
    input_paths: tuple[str, ...] | list[str] = (),
    out_dirs: tuple[str, ...] | list[str] = (),
) -> list[dict]:
    checks: list[dict] = []

    def add(name: str, ok: bool, detail: str) -> None:
        checks.append({"check": name, "ok": bool(ok), "detail": detail})

    # session alive + can schedule a job
    try:
        n = spark.range(2).count()
        add("spark_session", n == 2, f"spark {spark.version}")
    except Exception as e:  # pragma: no cover - session death is environmental
        add("spark_session", False, f"trivial job failed: {e}")

    arrow = str(
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
    ).lower()
    add(
        "arrow_enabled",
        arrow == "true",
        "Arrow batch transfer must be on for pandas UDF stages"
        if arrow != "true"
        else "enabled",
    )

    try:
        sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
        add("shuffle_partitions", sp > 0, str(sp))
    except Exception as e:
        add("shuffle_partitions", False, str(e))

    for p in input_paths:
        ok, detail = _input_readable(spark, p)
        add(f"input:{p}", ok, detail)

    for d in out_dirs:
        try:
            os.makedirs(d, exist_ok=True)
            marker = os.path.join(d, f".preflight-{uuid.uuid4().hex[:8]}")
            with open(marker, "w") as f:
                f.write("ok")
            os.remove(marker)
            add(f"out:{d}", True, "writable")
        except OSError as e:
            add(f"out:{d}", False, f"not writable: {e}")

    return checks


def preflight_or_raise(
    spark: SparkSession,
    input_paths: tuple[str, ...] | list[str] = (),
    out_dirs: tuple[str, ...] | list[str] = (),
) -> list[dict]:
    """Run all checks; raise RuntimeError naming EVERY failure (not just the
    first) if any check fails. Returns the check rows when all pass."""
    checks = run_preflight(spark, input_paths, out_dirs)
    failures = [c for c in checks if not c["ok"]]
    if failures:
        lines = "; ".join(f"{c['check']}: {c['detail']}" for c in failures)
        raise RuntimeError(f"preflight failed ({len(failures)} checks): {lines}")
    return checks
