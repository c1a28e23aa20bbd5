"""Sweep reference sqllogic .test files through the SQL door and report
(passed, total, stop reason) per file — the measuring tool behind
tests/test_reference_sqllogic.py's pins.

Usage:
    python scripts/sqllogic_sweep.py <file-or-dir> [...]     # relative to
        /root/reference/tests/sqllogic or absolute
    python scripts/sqllogic_sweep.py --pinned                # re-measure
        every file currently pinned in tests/test_reference_sqllogic.py

Each file runs in a FRESH SereneSession (matching the pytest fixture);
a failure inside a block is reported with its file:line, not raised.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/tests/sqllogic"


def main() -> None:
    from pyspark.sql import SparkSession

    from serenedb_spark.session import SereneSession
    from tests.sqllogic_runner import STOPPERS, parse_file, run_file

    args = sys.argv[1:]
    files: list[str] = []
    if args and args[0] == "--pinned":
        from tests.test_reference_sqllogic import FILES
        files = [f"{REF}/{f}" for f, _ in FILES]
        pins = {f"{REF}/{f}": n for f, n in FILES}
    else:
        pins = {}
        for a in args:
            p = a if os.path.isabs(a) else f"{REF}/{a}"
            if os.path.isdir(p):
                for root, _, names in os.walk(p):
                    files += [os.path.join(root, n) for n in sorted(names)
                              if n.endswith(".test")]
            else:
                files.append(p)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sqllogic-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for path in files:
        rel = os.path.relpath(path, REF)
        try:
            blocks = parse_file(path)
        except Exception as e:
            results.append((rel, -1, -1, f"PARSE ERROR: {e}"))
            continue
        ss = SereneSession(spark)
        try:
            stop: dict = {}
            passed, total = run_file(ss, path, stop_info=stop)
            reason = ""
            if passed < total and stop:
                reason = (f"stop@{stop['lineno']} [{stop['reason'][:80]}] "
                          f"{stop['sql'][:80]!r}")
            elif passed < total:
                reason = "stopped"
            flag = ""
            if pins.get(path) is not None and passed < pins[path]:
                flag = f"  !! SHRANK (pinned {pins[path]})"
            elif pins.get(path) is not None and passed > pins[path]:
                flag = f"  ++ GREW (pinned {pins[path]})"
            results.append((rel, passed, total, reason + flag))
            print(f"{passed:4d}/{total:<4d} {rel}  {reason}{flag}",
                  flush=True)
        except AssertionError as e:
            msg = str(e).splitlines()[0][:160]
            results.append((rel, -1, len(blocks), f"FAIL {msg}"))
            print(f"FAIL      {rel}  {msg}", flush=True)
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
            results.append((rel, -1, len(blocks), msg))
            print(f"ERR       {rel}  {msg}", flush=True)

    ok = sum(1 for _, p, t, _ in results if p >= 0)
    full = sum(1 for _, p, t, _ in results if p == t and p >= 0)
    print(f"\n{len(results)} files: {ok} ran clean, {full} to EOF, "
          f"{len(results) - ok} failed")


if __name__ == "__main__":
    main()
