#!/usr/bin/env python3
"""Independent external reader for the exported _delta_log.

Replays a graft-exported delta log with ZERO graft code on the read
path — checkpoint parquet via DuckDB, json tail via the stdlib — then:

  1. resolves the live file set and reads it through DuckDB's parquet
     scanner, hash-comparing rows against an expected parquet dump
     (null-filling columns files predate, per the metaData schema);
  2. verifies every add action's stats: numRecords exactly matches the
     file, and every minValues/maxValues bound actually bounds the
     file's data (a wrong exported bound would make a real external
     engine skip files it needed — silent data loss);
  3. verifies txn watermarks survive checkpoint+tail replay.

Usage: check_delta_export.py <tablePath> <expectedParquetDir>
Exit 0 on full match; prints one result line per check.
"""
import json
import os
import re
import sys

import duckdb

SINGLE_PART = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
MULTI_PART = re.compile(r"^(\d{20})\.checkpoint\.(\d+)\.(\d+)\.parquet$")


def complete_checkpoints(logdir):
    """version -> sorted part paths, for every COMPLETE checkpoint
    (single-file, or multi-part with all M parts present). A crashed
    exporter may leave partial part sets or a stale/absent
    `_last_checkpoint`; like delta-spark, treat the pointer as a hint
    and never follow it into an incomplete checkpoint."""
    singles, multis = {}, {}
    for f in os.listdir(logdir):
        m = SINGLE_PART.match(f)
        if m:
            singles[int(m.group(1))] = [os.path.join(logdir, f)]
            continue
        m = MULTI_PART.match(f)
        if m:
            v, k, tot = int(m.group(1)), int(m.group(2)), int(m.group(3))
            multis.setdefault((v, tot), {})[k] = os.path.join(logdir, f)
    out = {}
    for (v, tot), parts in multis.items():
        if set(parts) == set(range(1, tot + 1)):
            out[v] = [parts[k] for k in sorted(parts)]
    out.update(singles)  # single-file preferred when both exist
    return out


def replay(table):
    logdir = os.path.join(table, "_delta_log")
    entries = sorted(
        int(f[: -len(".json")])
        for f in os.listdir(logdir)
        if f.endswith(".json") and not f.startswith(".")
    )
    live, txns, schema = {}, {}, None
    complete = complete_checkpoints(logdir)
    pointed = -1
    lc = os.path.join(logdir, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as fh:
            pointed = json.load(fh).get("version", -1)
    if pointed in complete:
        ckpt_v = pointed
    elif complete:
        ckpt_v = max(complete)
    else:
        ckpt_v = -1
    if ckpt_v >= 0:
        parts = ", ".join(f"'{p}'" for p in complete[ckpt_v])
        ck = f"[{parts}]"
        con = duckdb.connect()
        for (p, stats) in con.sql(
            f"SELECT add.path, add.stats FROM parquet_scan({ck}) "
            "WHERE add.path IS NOT NULL"
        ).fetchall():
            live[p] = stats
        for (app, v) in con.sql(
            f"SELECT txn.appId, txn.version FROM parquet_scan({ck}) "
            "WHERE txn.appId IS NOT NULL"
        ).fetchall():
            txns[app] = v
        for (s,) in con.sql(
            f"SELECT metaData.schemaString FROM parquet_scan({ck}) "
            "WHERE metaData.id IS NOT NULL"
        ).fetchall():
            schema = json.loads(s)
        con.close()
    for v in entries:
        if v <= ckpt_v:
            continue
        with open(os.path.join(logdir, "%020d.json" % v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                n = json.loads(line)
                if "metaData" in n:
                    schema = json.loads(n["metaData"]["schemaString"])
                if "add" in n:
                    live[n["add"]["path"]] = n["add"].get("stats")
                if "remove" in n:
                    live.pop(n["remove"]["path"], None)
                if "txn" in n:
                    txns[n["txn"]["appId"]] = n["txn"]["version"]
    return live, txns, schema, ckpt_v


SQLTYPE = {
    "long": "BIGINT", "integer": "INTEGER", "short": "SMALLINT",
    "byte": "TINYINT", "double": "DOUBLE", "float": "FLOAT",
    "string": "VARCHAR", "boolean": "BOOLEAN", "date": "DATE",
}


def main():
    table, expected = sys.argv[1], sys.argv[2]
    live, txns, schema, ckpt_v = replay(table)
    cols = [f["name"] for f in schema["fields"]]
    types = {f["name"]: f["type"] for f in schema["fields"]}
    con = duckdb.connect()
    ok = True

    # 1. snapshot content: union of live files (null-filling columns a
    #    file predates) must hash-match the expected dump
    selects = []
    for rel in sorted(live):
        f = os.path.join(table, rel)
        have = {
            r[0] for r in con.sql(
                f"SELECT name FROM parquet_schema('{f}')").fetchall()
        }
        proj = ", ".join(
            f'"{c}"' if c in have
            else f'CAST(NULL AS {SQLTYPE[types[c]]}) AS "{c}"'
            for c in cols
        )
        selects.append(f"SELECT {proj} FROM parquet_scan('{f}')")
    body = " UNION ALL ".join(selects)
    order = ", ".join(f'"{c}"' for c in cols)
    h1 = con.sql(
        "SELECT count(*), md5(string_agg(r, '|' ORDER BY r)) FROM ("
        f"SELECT concat_ws(',', {order}) AS r FROM ({body}))"
    ).fetchone()
    h2 = con.sql(
        "SELECT count(*), md5(string_agg(r, '|' ORDER BY r)) FROM ("
        f"SELECT concat_ws(',', {order}) AS r "
        f"FROM parquet_scan('{expected}/*.parquet'))"
    ).fetchone()
    print(f"snapshot: delta={h1} expected={h2}", end=" ")
    print("MATCH" if h1 == h2 else "MISMATCH")
    ok &= h1 == h2

    # 2. per-file stats: numRecords exact; every emitted bound bounds
    nfiles = nbounds = 0
    for rel, stats_s in live.items():
        if not stats_s:
            continue
        st = json.loads(stats_s)
        f = os.path.join(table, rel)
        nrows = con.sql(
            f"SELECT count(*) FROM parquet_scan('{f}')").fetchone()[0]
        if st["numRecords"] != nrows:
            print(f"stats: {rel}: numRecords {st['numRecords']} != {nrows}")
            ok = False
        nfiles += 1
        for side, agg, cmp in (("minValues", "min", "<"),
                               ("maxValues", "max", ">")):
            for c, bound in st.get(side, {}).items():
                lit = f"DATE '{bound}'" if types[c] == "date" else (
                    "'" + str(bound).replace("'", "''") + "'"
                    if types[c] == "string" else repr(bound))
                bad = con.sql(
                    f'SELECT count(*) FROM parquet_scan(\'{f}\') '
                    f'WHERE "{c}" {cmp} {lit}'
                ).fetchone()[0]
                if bad:
                    print(f"stats: {rel}: {side}.{c}={bound} violated "
                          f"by {bad} rows")
                    ok = False
                nbounds += 1
    print(f"stats: {nfiles} files, {nbounds} bounds verified "
          + ("OK" if ok else "BAD"))

    # 3. txn watermarks (through checkpoint at v{ckpt_v} + tail)
    print(f"txns (ckpt v{ckpt_v}): {sorted(txns.items())}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
