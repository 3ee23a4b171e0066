"""Capped per-session cache of expensive "truth arm" DataFrames.

Recall gates (sim_recall_*_vs_bruteforce, the knn gates) each need the
SAME exact O(n²) arm; without sharing, a bench/gate run recomputes it
once per gate.  The cache pins the truth arm with a lazy
``localCheckpoint`` so it is materialized once per (session, sf_dir)
and every later gate reuses the blocks.

The cache is CAPPED (round-5 ADVICE: an unbounded dict pins dead
checkpoint blocks in executor storage for the application lifetime
when one long-lived session walks many sf_dirs).  Insertion beyond
``maxsize`` evicts the oldest entry FIFO and best-effort-unpersists
its blocks; keys embed ``applicationId`` so a new session never sees
another session's dead checkpoint.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class CheckpointCache:
    """FIFO-capped map of key → lazily-localCheckpointed DataFrame."""

    def __init__(self, maxsize: int = 4):
        self.maxsize = maxsize
        self._entries: "OrderedDict[tuple, DataFrame]" = OrderedDict()

    def get(
        self,
        spark: SparkSession,
        name: str,
        sf_dir: str,
        builder: Callable[[], DataFrame],
    ) -> DataFrame:
        key = (spark.sparkContext.applicationId, name, sf_dir)
        hit = self._entries.get(key)
        if hit is None:
            hit = builder().localCheckpoint(eager=False)
            while len(self._entries) >= self.maxsize:
                _, old = self._entries.popitem(last=False)
                try:
                    # Frees the checkpoint's storage blocks for the
                    # common case; a failure only means the blocks die
                    # with the application instead of now.
                    old.unpersist()
                except Exception:
                    pass
            self._entries[key] = hit
        return hit

    def clear(self) -> None:
        while self._entries:
            _, old = self._entries.popitem(last=False)
            try:
                old.unpersist()
            except Exception:
                pass
