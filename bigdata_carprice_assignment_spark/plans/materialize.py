"""Materialization barriers with an explicit lifecycle.

``DataFrame.localCheckpoint`` truncates lineage and pins RDD blocks
until the JVM garbage-collects the RDD — on a long-lived session (bench
warm runs, any shared cluster app) repeated index builds accumulate
blocks, and each run gets slower (round-2 bench: the ANN queries' warm
runs were 1.5× their cold time). :func:`pinned` uses ``persist``
instead: the plan stays recomputable, so unpersisting is always safe,
and each named pool frees its previous generation the moment a new
build starts — steady-state block usage is one generation per pool.
"""

from __future__ import annotations

import itertools
import logging
from collections import deque

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)

_POOLS: dict[str, DataFrame] = {}


def pinned(df: DataFrame, pool: str, eager: bool = True) -> DataFrame:
    """``persist()`` ``df``, freeing whatever ``pool`` pinned previously.

    Safe by construction: persist keeps lineage, so if an old result is
    somehow re-collected after its blocks were freed it recomputes
    (slower, never wrong) — the failure mode ``localCheckpoint`` would
    turn into a missing-block error. ``eager`` materializes the blocks
    with one ``count()`` so downstream branches of the SAME job (e.g. a
    self-join) read the cache instead of racing to compute the upstream
    tree twice — the property the old eager localCheckpoint provided.
    """
    prev = _POOLS.pop(pool, None)
    if prev is not None:
        prev.unpersist(blocking=False)
    out = df.persist()
    _POOLS[pool] = out
    if eager:
        out.count()
    return out


_FAMILY_SEQ = itertools.count()
_FAMILIES: dict[str, deque[str]] = {}


def pinned_lru(df: DataFrame, family: str, keep: int = 4, eager: bool = True) -> DataFrame:
    """``pinned`` keyed by a MONOTONIC id within ``family``, keeping the
    ``keep`` most recent generations.

    Replaces the fixed rotating-slot ring: a ring of k names means the
    (k+1)-th call in ONE composed plan silently evicts the 1st pin
    mid-plan (hidden recompute cliff — lineage keeps it correct but the
    branch re-executes from shuffle files), and concurrent plan builds
    race the slot counter. A monotonic id never reuses a name, so a pin
    is only ever evicted by AGE (logged below), never by name collision;
    ``itertools.count`` makes the id draw atomic under the GIL."""
    q = _FAMILIES.setdefault(family, deque())
    while len(q) >= keep:
        # Age-based eviction is the designed steady-state bound (one
        # new generation in, the oldest out). If a single composed plan
        # holds more than ``keep`` live cumsums the oldest branch
        # recomputes from shuffle files — slower, never wrong — and the
        # debug log names exactly which generation was dropped.
        old = q.popleft()
        _LOG.debug("pinned_lru: family %r evicting %r (keep=%d)", family, old, keep)
        prev = _POOLS.pop(old, None)
        if prev is not None:
            prev.unpersist(blocking=False)
    name = f"{family}#{next(_FAMILY_SEQ)}"
    q.append(name)
    return pinned(df, name, eager=eager)


def release_all() -> None:
    """Unpersist every pool (test teardown / session shutdown)."""
    for pool in list(_POOLS):
        _POOLS.pop(pool).unpersist(blocking=False)
    _FAMILIES.clear()


def pool_get(pool: str, spark) -> DataFrame | None:
    """Return ``pool``'s live generation if it belongs to ``spark``,
    else None. Lets corpus-keyed builds (feature matrices, signature
    tables) be computed once per session and REUSED across queries —
    the session-identity check guards against handing out a DataFrame
    whose SparkSession was stopped (tests spin sessions up and down in
    one process)."""
    df = _POOLS.get(pool)
    if df is not None and df.sparkSession is spark:
        return df
    return None
