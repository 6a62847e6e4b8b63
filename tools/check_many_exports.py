#!/usr/bin/env python3
"""Batch driver for check_delta_export.py: ONE python process checking
many exported tables (the export-protocol fuzz spec produces ~100
table dirs; spawning one interpreter per table would dominate the
runtime). Same checks, same independence — this file only loops.

Usage: check_many_exports.py <manifest.tsv>
  each line: <tablePath>\t<expectedParquetDir>
Exit 0 iff every table passes every check.
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_delta_export as cde  # noqa: E402

def run_one(table, expected):
    """None on pass, else an error string with the captured check log."""
    sys.argv = ["check_delta_export.py", table, expected]
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            cde.main()
        return None  # main() sys.exits; reaching here means no exit
    except SystemExit as e:
        if e.code in (0, None):
            return None
        return f"exit {e.code}\n{buf.getvalue()}"
    except Exception as e:  # assertion or replay error
        return f"{type(e).__name__}: {e}\n{buf.getvalue()}"

def main():
    manifest = sys.argv[1]
    fails = []
    n = 0
    for line in open(manifest):
        line = line.rstrip("\n")
        if not line:
            continue
        table, expected = line.split("\t")
        n += 1
        err = run_one(table, expected)
        if err:
            fails.append((table, err))
            print(f"FUZZ-FAIL {table}: {err}")
        else:
            print(f"FUZZ-OK   {table}")
    print(f"{n - len(fails)} ok / {len(fails)} fail of {n} exports")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
