"""PySpark worker daemon with pre-warmed imports.

Used via ``spark.python.daemon.module=admarus_spark.daemon_prewarm``. Worker
processes FORK from this daemon, so importing the heavy scientific stack
here (once) makes every forked worker inherit warm modules — a fresh
worker's first task no longer pays the ~0.5-1 s pandas/numpy/pyarrow import.

This matters because the engine also disables ``spark.python.worker.reuse``:
with reuse on, short Arrow-UDF bursts inside longer tasks stagger their
worker demand, the pool never grows past one worker, and the whole stage
serializes behind it (measured: one worker at ~80% CPU serving 32 tasks).
With cheap forks, worker-per-task restores full parallelism.
"""

import pandas  # noqa: F401
import pyarrow  # noqa: F401  (Arrow serialization used by every SQL UDF)

import numpy  # noqa: F401  isort: skip
import admarus_spark.index.codec  # noqa: F401  (engine UDF hot paths)
import admarus_spark.tokenizer  # noqa: F401

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
