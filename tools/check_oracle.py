"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given scale factor, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values canonicalized).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


def _type_class(t: str) -> str:
    """Collapse a dtype string (either engine) to a comparison class so
    Spark/DuckDB output columns can be checked for hash-compatibility.
    The driver's hasher canonicalizes values type-sensitively, so e.g.
    DuckDB HUGEINT (decimal128 over Arrow) vs Spark BIGINT hash-mismatches
    even when every value is equal (the round-5 ``bpe_pair_counts`` red row)."""
    t = t.strip().upper()
    if t.startswith(("DECIMAL", "HUGEINT", "UHUGEINT")):
        return "decimal"
    if t.startswith(("ARRAY", "STRUCT", "MAP")) or "[]" in t or t.startswith("LIST"):
        return "nested"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT", "LONG", "SHORT", "BYTE") or t.startswith(
        ("UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")
    ):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE", "DOUBLE PRECISION"):
        return "float"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "str"
    if t in ("BOOLEAN", "BOOL"):
        return "bool"
    if t in ("BLOB", "BINARY", "BYTEA"):
        return "binary"
    if t.startswith(("TIMESTAMP", "DATE")):
        return "temporal"
    return t.lower()


def oracle_type_problems(con, sql, spark_dtypes):
    """DESCRIBE the oracle (plan-only, no execution) and return problems:
    banned output types (HUGEINT/DECIMAL/unsigned) and per-column dtype
    class mismatches against the Spark result schema."""
    problems = []
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:  # pragma: no cover - surfaced as a failure upstream
        return [f"describe error: {str(e)[:120]}"]
    duck_types = {r[0]: r[1] for r in desc}
    for col, dt in duck_types.items():
        if dt.strip().upper().startswith(BANNED_DUCK_TYPES):
            problems.append(
                f"oracle column `{col}` has banned DuckDB type {dt} "
                f"(surfaces as decimal128 over Arrow; CAST it in the oracle SQL)"
            )
    sd = dict(spark_dtypes)
    for col, dt in duck_types.items():
        if col in sd and _type_class(dt) != _type_class(sd[col]):
            problems.append(
                f"dtype class mismatch on `{col}`: spark {sd[col]} "
                f"({_type_class(sd[col])}) vs duckdb {dt} ({_type_class(dt)})"
            )
    return problems


def result_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        type_problems = oracle_type_problems(con, oracles[name], sdf.dtypes)
        if type_problems:
            print(f"FAIL {name}: " + "; ".join(type_problems[:3]))
            failures.append(name)
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh, dh = result_hash(scols, srows), result_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash spark={sh} duck={dh}")
                # show first differing line for debugging
                so = sorted(
                    "|".join(
                        canon(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                do = sorted(
                    "|".join(
                        canon(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                )
                for a, b in zip(so, do):
                    if a != b:
                        problems.append(f"  first diff:\n  spark: {a}\n  duck : {b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows, hash match")
    spark.stop()
    print(f"\n{n_run - len(failures)}/{n_run} queries pass ({len(qs)} registered)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
