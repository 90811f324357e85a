#!/usr/bin/env python3
"""Generate the sf1 RELATIONAL rehearsal tables (see SCALE.md) into
/tmp/sf1: the sf0.1 TPC-H-ish fact tables replicated 10x with key
remapping, so every join key relationship survives (each replica is a
disjoint key range; dims region/nation stay as-is).

Dev-side only, deterministic (pure SQL over the driver tables — no
RNG at all). Offsets are powers of ten above each key's max so
replicated keys never collide and stay human-readable.
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sf1"

# key offsets: one decade above the sf0.1 max of each key space
OFF_ORD = 10_000_000   # max o_orderkey 6M-ish
OFF_CUST = 100_000     # max c_custkey 15k
OFF_PART = 100_000     # max p_partkey 20k
OFF_SUPP = 10_000      # max s_suppkey 1k
OFF_EVT = 1_000_000    # max event_id 100k
OFF_USER = 100_000     # max user_id


def main():
    con = duckdb.connect()
    # the driver corpus carries UTC-adjusted parquet timestamps; plain
    # DuckDB TIMESTAMP would come back as TIMESTAMP_NTZ in Spark and
    # break ts arithmetic — cast through TIMESTAMPTZ under UTC.
    # events.ts: the driver writes parquet TIMESTAMP(NANOS) which the
    # engine reads as long nanos (nanosAsLong); DuckDB's parquet writer
    # can only emit micros, so write epoch_ns BIGINT — the engine's
    # `ts div 1000` ingestion treats both identically.
    con.execute("SET timezone = 'UTC'")
    os.makedirs(OUT, exist_ok=True)
    for t in ["lineitem", "orders", "customer", "supplier", "part", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")
    jobs = {
        "lineitem": f"""
            SELECT l_orderkey + r.r * {OFF_ORD} AS l_orderkey,
                   l_partkey + r.r * {OFF_PART} AS l_partkey,
                   l_suppkey + r.r * {OFF_SUPP} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus,
                   l_shipdate::TIMESTAMPTZ AS l_shipdate
            FROM lineitem, range(0, 10) r(r)""",
        "orders": f"""
            SELECT o_orderkey + r.r * {OFF_ORD} AS o_orderkey,
                   o_custkey + r.r * {OFF_CUST} AS o_custkey,
                   o_orderstatus, o_totalprice,
                   o_orderdate::TIMESTAMPTZ AS o_orderdate, o_orderpriority
            FROM orders, range(0, 10) r(r)""",
        "customer": f"""
            SELECT c_custkey + r.r * {OFF_CUST} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer, range(0, 10) r(r)""",
        "supplier": f"""
            SELECT s_suppkey + r.r * {OFF_SUPP} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier, range(0, 10) r(r)""",
        "part": f"""
            SELECT p_partkey + r.r * {OFF_PART} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM part, range(0, 10) r(r)""",
        "events": f"""
            SELECT event_id + r.r * {OFF_EVT} AS event_id,
                   epoch_ns(ts) AS ts,
                   user_id + r.r * {OFF_USER} AS user_id,
                   event_type, value, props
            FROM events, range(0, 10) r(r)""",
    }
    for t, sql in jobs.items():
        con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    for t in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
