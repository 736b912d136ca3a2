"""Progress / deadline monitor — the TessMonitor analog
(/root/reference/src/monitor.rs:18-50: ``set_deadline_msecs`` +
``get_progress`` + cancel-flag polling).

Two halves, mapped onto Spark's execution model:

- **deadline**: ``ExtractConfig.page_timeout_ms`` is broadcast with the
  config and enforced *cooperatively inside the fused kernels* (the token
  loop checks the wall clock every few thousand tokens).  Expiry yields a
  ``status='timeout'`` row — a row, never a task failure, so one
  pathological page cannot stall a 10^12-doc job (the reference's
  cancellation likewise surfaces as an error result, not a crash).
- **progress**: a Spark accumulator incremented once per Arrow batch by
  the extraction generators.  Accumulators are the distributed analog of
  the reference's shared ``MONITOR_PROGRESS`` cell: cheap worker-side
  adds, aggregated on the driver, readable while the job runs (from a
  separate thread) or after it completes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class ProgressMonitor:
    """Driver-visible progress counters for a distributed extraction run.

    ``pages`` counts rows entering the kernel; ``batches`` counts Arrow
    batches.  Pass to :func:`operators.extract.extract_text` (or twins);
    read ``monitor.pages`` on the driver."""

    def __init__(self, spark: SparkSession) -> None:
        self._pages = spark.sparkContext.accumulator(0)
        self._batches = spark.sparkContext.accumulator(0)

    # worker side -----------------------------------------------------
    def add_batch(self, n_rows: int) -> None:
        self._pages.add(int(n_rows))
        self._batches.add(1)

    # driver side -----------------------------------------------------
    @property
    def pages(self) -> int:
        return int(self._pages.value)

    @property
    def batches(self) -> int:
        return int(self._batches.value)
