"""Python worker daemon that pre-imports the heavy libraries.

PySpark forks each worker from the daemon process; a forked child
inherits the parent's imported modules for free (copy-on-write
pages). The stock daemon imports only pyspark internals, so every
freshly forked worker pays the numpy/pandas/pyarrow import chain
(~0.35 s of CPU) before its first batch — and the worker pool churns
under chained mapInPandas stages (measured ~60 fresh forks per bench
pass on the two-hop kernel rows: ~20 CPU-seconds of pure imports per
pass). Importing those libraries HERE, once, in the daemon parent
moves that cost out of every fork (guide §4.5: heavyweight init once,
amortized — applied to the interpreter itself).

Best-effort: a missing library just falls through to the stock
behavior (the worker imports it on first use), so this module can
never fail to import. Activated via ``spark.python.daemon.module`` by
:func:`..session.get_spark` — only for sessions this engine creates;
a driver-owned session keeps the stock daemon.
"""

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.pandas_compat"):
    try:
        __import__(_mod)
    except Exception:  # pragma: no cover — optional accelerators
        pass

# pyspark.worker is what each forked child runs; importing it (and
# through it the serializers) in the parent warms the fork further
try:
    import pyspark.worker  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
