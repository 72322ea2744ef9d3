"""Scratch-space allocation for demo engine tables, ANN index layouts and
streaming checkpoints.

Local-mode benchmarks should measure the engine's compute paths, not a
co-tenant's load on the shared virtual disk: demo part writes are small
(MBs) and fsync-latency-bound, so a noisy neighbor can triple apparent
insert throughput run-to-run (observed 3.3s → 19.4s on an idle-CPU
machine). Scratch therefore prefers tmpfs (/dev/shm) when present — on a
real cluster parts land on object storage / HDFS through an entirely
different IO path, so nothing about the local disk was representative
anyway. Override with $SPARK_GRAFT_SCRATCH.

Every directory is registered for removal at interpreter exit: demo
tables must outlive the lazy DataFrames returned over them (the driver
collects after the query function returns), so cleanup cannot happen
inside the query itself.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile


def scratch_root() -> str:
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()


def scratch_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def fixed_scratch_dir(name: str) -> str:
    """A deterministic scratch path (same every call in this process).

    For side tables whose location must be known at import time — e.g. a
    persisted-hash table referenced by a statically-declared DuckDB oracle
    SQL string. Not created here; the writer creates/overwrites it.
    Registered for atexit removal so repeated runs don't accumulate.
    """
    d = os.path.join(scratch_root(), name)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
