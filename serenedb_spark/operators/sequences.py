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
    def create(self, name: str, start: int | None = None,
               increment: int = 1,
               minvalue: int | None = None, maxvalue: int | None = None,
               cycle: bool = False) -> None:
        if name in self._seqs:
            raise ValueError(f"sequence {name!r} already exists")
        if start is None:  # PG: START defaults to MIN (asc) / MAX (desc)
            start = (minvalue if increment > 0 and minvalue is not None
                     else maxvalue if increment < 0 and maxvalue
                     is not None else 1 if increment > 0 else -1)
        if increment == 0:
            raise ValueError("increment must be nonzero")
        if minvalue is not None and maxvalue is not None \
                and minvalue >= maxvalue:
            raise ValueError(
                f"sequence {name!r}: MINVALUE ({minvalue}) must be less "
                f"than MAXVALUE ({maxvalue})")
        if (minvalue is not None and start < minvalue) or \
                (maxvalue is not None and start > maxvalue):
            raise ValueError(
                f"sequence {name!r}: START {start} is outside "
                f"[{minvalue}, {maxvalue}]")
        self._seqs[name] = {
            "next": start, "increment": increment, "start": start,
            "min": minvalue, "max": maxvalue, "cycle": cycle,
            "called": False, "current": None,
        }
        self._commit()

    def drop(self, name: str) -> None:
        del self._seqs[name]
        self._commit()

    def resolve(self, name: str) -> str:
        """Schema-qualified lookups (drop_cascade_cross_schema.test:
        nextval('schema.seq')): the full name wins, else the bare tail
        (a public-schema sequence referenced unqualified)."""
        if name in self._seqs:
            return name
        tail = name.split(".")[-1]
        if tail in self._seqs:
            return tail
        raise KeyError(name)

    # ---- the four PG functions ------------------------------------------
    def _wrap_params(self, name: str) -> tuple[int, int] | None:
        """(anchor, k) when the sequence CYCLES over a finite range:
        PG restarts at MIN (asc) / MAX (desc) when the next value would
        pass the bound. After the first wrap the stream is periodic on
        the anchor grid with period k = values per sweep — but the FIRST
        sweep advances from the actual current value (which may be
        off-grid after START/setval: inc 3, 1..10 START 2 CYCLE →
        2,5,8,1,4,..., PG semantics), so callers combine this with the
        in-sweep value count m computed from the live position."""
        s = self._seqs[name]
        inc, hi, lo = s["increment"], s["max"], s["min"]
        if not s["cycle"]:
            return None
        if inc > 0 and hi is not None:
            anchor = lo if lo is not None else 1
        elif inc < 0 and lo is not None:
            anchor = hi if hi is not None else -1
        else:
            return None
        limit = hi if inc > 0 else lo
        k = (limit - anchor) // inc + 1
        return (anchor, k) if k > 0 else None

    def nextval(self, name: str, n: int = 1) -> int:
        """Advance by n steps, return the FIRST allocated value (n > 1 is
        the block-reserve form used by assign_sequence)."""
        name = self.resolve(name)
        s = self._seqs[name]
        first = s["next"]
        inc = s["increment"]
        last = first + inc * (n - 1)
        hi, lo = s["max"], s["min"]
        wrap = self._wrap_params(name)
        if wrap is not None:
            anchor, k = wrap
            over = (inc > 0 and first > hi) or (inc < 0 and first < lo)
            if over:
                first = anchor
            limit = hi if inc > 0 else lo
            # m values remain in the current sweep (advancing from the
            # ACTUAL first, not its anchor-grid projection: PG continues
            # 2,5,8 then wraps to 1,4,... for inc 3, 1..10 START 2)
            m = (limit - first) // inc + 1

            def _val(j: int) -> int:
                return (first + j * inc if j < m
                        else anchor + ((j - m) % k) * inc)

            s["current"] = _val(n - 1)
            s["next"] = _val(n)
            s["called"] = True
            self._last_used = name
            self._commit()
            return first
        if inc > 0 and hi is not None and last > hi:
            raise ValueError(
                f'nextval: reached maximum value of sequence "{name}" '
                f"({hi})")
        if inc < 0 and lo is not None and last < lo:
            raise ValueError(
                f'nextval: reached minimum value of sequence "{name}" '
                f"({lo})")
        s["next"] = last + inc
        s["current"] = last
        s["called"] = True
        self._last_used = name
        self._commit()
        return first

    def currval(self, name: str) -> int:
        name = self.resolve(name)
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
        name = self.resolve(name)
        s = self._seqs[name]
        lo, hi = s["min"], s["max"]
        if (lo is not None and value < lo) or \
                (hi is not None and value > hi):
            raise ValueError(
                f'setval: value {value} is out of bounds for sequence '
                f'"{name}" ({lo}..{hi})')
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
        name = self.resolve(name)
        first = self.nextval(name, n)
        s = self._seqs[name]
        inc = s["increment"]
        wrap = self._wrap_params(name)

        def val(rn0):
            if wrap is None:
                return F.lit(first) + rn0 * F.lit(inc)
            anchor, k = wrap
            limit = s["max"] if inc > 0 else s["min"]
            m = (limit - first) // inc + 1  # values left in this sweep
            return F.when(
                rn0 < F.lit(m), F.lit(first) + rn0 * F.lit(inc)
            ).otherwise(
                F.lit(anchor)
                + F.pmod(rn0 - F.lit(m), F.lit(k)) * F.lit(inc))

        if order_by is not None:
            w = Window.orderBy(*order_by)
            rn = F.row_number().over(w)  # global order: sort is the cost
            return df.withColumn(out_col, val(rn - 1))
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
                val(F.col("__off") + F.row_number().over(w) - 1),
            )
            .drop("__pid", "__off")
        )
