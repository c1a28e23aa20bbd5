"""PG sequences — nextval/currval/setval/lastval + distributed block
assignment.

Reference: server/connector/functions/sequence.cpp (284 LoC) registers the
four PG sequence functions; sequences are inherently a single-point
counter in PG too, so the Spark mapping keeps allocation DRIVER-SIDE
(atomic on one JSON state file via tmp+rename, the same commit idiom as
operators/maintenance.DiskSearchTable) and makes the DISTRIBUTED part the
block-assignment operator: reserve one contiguous block per DataFrame and
stamp rows executor-side with row_number — one driver roundtrip per
relation, never per row, which is exactly how bulk ``nextval`` loads scale
(PG itself pre-allocates with the sequence CACHE clause).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class SequenceCatalog:
    """Named sequences with durable state (one JSON file, atomic rename).

    In-memory when ``path`` is None (session-scoped, like temp sequences).
    """

    def __init__(self, path: str | None = None):
        self._path = path
        self._seqs: dict[str, dict] = {}
        self._last_used: str | None = None
        if path and os.path.exists(path):
            with open(path) as f:
                self._seqs = json.load(f)

    def _commit(self) -> None:
        if not self._path:
            return
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._seqs, f)
        os.replace(tmp, self._path)  # the commit point

    # ---- DDL -------------------------------------------------------------
    def create(self, name: str, start: int = 1, increment: int = 1,
               minvalue: int | None = None, maxvalue: int | None = None,
               cycle: bool = False) -> None:
        if name in self._seqs:
            raise ValueError(f"sequence {name!r} already exists")
        if increment == 0:
            raise ValueError("increment must be nonzero")
        self._seqs[name] = {
            "next": start, "increment": increment, "start": start,
            "min": minvalue, "max": maxvalue, "cycle": cycle,
            "called": False, "current": None,
        }
        self._commit()

    def drop(self, name: str) -> None:
        del self._seqs[name]
        self._commit()

    # ---- the four PG functions ------------------------------------------
    def nextval(self, name: str, n: int = 1) -> int:
        """Advance by n steps, return the FIRST allocated value (n > 1 is
        the block-reserve form used by assign_sequence)."""
        s = self._seqs[name]
        first = s["next"]
        inc = s["increment"]
        last = first + inc * (n - 1)
        hi, lo = s["max"], s["min"]
        if inc > 0 and hi is not None and last > hi:
            if not s["cycle"]:
                raise ValueError(f"sequence {name!r} exceeded maxvalue {hi}")
            first = lo if lo is not None else s["start"]
            last = first + inc * (n - 1)
        if inc < 0 and lo is not None and last < lo:
            if not s["cycle"]:
                raise ValueError(f"sequence {name!r} exceeded minvalue {lo}")
            first = hi if hi is not None else s["start"]
            last = first + inc * (n - 1)
        s["next"] = last + inc
        s["current"] = last
        s["called"] = True
        self._last_used = name
        self._commit()
        return first

    def currval(self, name: str) -> int:
        s = self._seqs[name]
        if not s["called"]:
            raise ValueError(
                f"currval of sequence {name!r} is not yet defined in "
                "this session"
            )
        return s["current"]

    def lastval(self) -> int:
        if self._last_used is None:
            raise ValueError("lastval is not yet defined in this session")
        return self.currval(self._last_used)

    def setval(self, name: str, value: int, is_called: bool = True) -> int:
        s = self._seqs[name]
        s["current"] = value
        s["called"] = is_called
        s["next"] = value + s["increment"] if is_called else value
        self._last_used = name
        self._commit()
        return value

    # ---- distributed assignment -----------------------------------------
    def assign(self, df: DataFrame, name: str, out_col: str,
               order_by: list | None = None) -> DataFrame:
        """Stamp every row with a sequence value: ONE block reservation
        (driver) + row_number (executors). With order_by the numbering is
        deterministic; without it, assignment order is arbitrary but values
        are still unique — PG gives the same non-guarantee for parallel
        nextval. The single-partition window is avoided: row_number runs
        per-partition and a partition-offset join makes ids global."""
        n = df.count()
        if n == 0:
            return df.withColumn(out_col, F.lit(None).cast("long"))
        first = self.nextval(name, n)
        inc = self._seqs[name]["increment"]
        if order_by is not None:
            w = Window.orderBy(*order_by)
            rn = F.row_number().over(w)  # global order: sort is the cost
            return df.withColumn(
                out_col, F.lit(first) + (rn - 1) * F.lit(inc)
            )
        # scale path: per-partition row_number + broadcast offsets — no
        # global sort, no single-reducer window
        pid = F.spark_partition_id()
        with_pid = df.withColumn("__pid", pid)
        counts = (
            with_pid.groupBy("__pid").count()
            .orderBy("__pid").collect()
        )
        offsets, acc = {}, 0
        for r in counts:
            offsets[r["__pid"]] = acc
            acc += r["count"]
        off_df = df.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __off long"
        )
        w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
        return (
            with_pid.join(F.broadcast(off_df), "__pid")
            .withColumn(
                out_col,
                F.lit(first)
                + (F.col("__off") + F.row_number().over(w) - 1) * F.lit(inc),
            )
            .drop("__pid", "__off")
        )
