#!/usr/bin/env python3
"""Deterministic 10x scale-up of the driver test tables (VERDICT r4 next-4:
the 241-entry correctness board had only been proven at sf0.001/0.01 — this
builds the input for a board run at 10x the bench scale, 100x the driver's
correctness scale).

Shape preserved, keys shifted per copy so engine and oracle see the SAME
larger input (operator correctness is Spark-vs-DuckDB agreement on identical
data, not a property of the distribution):
  - documents: doc_id += c*N; copies c>0 get a per-copy suffix token so
    texts are near- but not exact-duplicates (dedup operators keep working);
    n_chars recomputed from the new text. Shift N=5000 is a multiple of 10,
    preserving the doc_id%10 train/test split density.
  - events: event_id += c*N, ts += c seconds (no exact-duplicate rows).
  - embeddings: vec_id += c*N.
  - lineitem/orders: orderkey += c*(max+1) in BOTH tables (fk intact);
    dims (customer/supplier/part/nation/region) copied as-is — a valid
    star schema scales facts, not dims.

Usage: gen_scaled_tables.py <srcDir> <dstDir> [copies=10]
"""
import sys, os, shutil
import duckdb

def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 8")

    def rd(name):
        return f"read_parquet('{src}/{name}.parquet')"

    def write(name, sql):
        con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0]
        print(f"[gen_scaled] {name}: {n} rows")

    n_docs = con.execute(f"SELECT count(*) FROM {rd('documents')}").fetchone()[0]
    write("documents", " UNION ALL ".join(
        f"""SELECT doc_id + {c*n_docs} AS doc_id,
               text {f"|| ' scaletoken{c}'" if c else ''} AS text,
               lang, source,
               CAST(length(text {f"|| ' scaletoken{c}'" if c else ''}) AS BIGINT) AS n_chars
            FROM {rd('documents')}""" for c in range(copies)))

    n_ev = con.execute(f"SELECT count(*) FROM {rd('events')}").fetchone()[0]
    write("events", " UNION ALL ".join(
        f"""SELECT event_id + {c*n_ev} AS event_id,
               ts + INTERVAL {c} SECOND AS ts,
               user_id, event_type, value, props
            FROM {rd('events')}""" for c in range(copies)))

    n_vec = con.execute(f"SELECT count(*) FROM {rd('embeddings')}").fetchone()[0]
    write("embeddings", " UNION ALL ".join(
        f"SELECT vec_id + {c*n_vec} AS vec_id, embedding, label FROM {rd('embeddings')}"
        for c in range(copies)))

    max_ok = con.execute(f"SELECT max(o_orderkey) FROM {rd('orders')}").fetchone()[0] + 1
    write("orders", " UNION ALL ".join(
        f"""SELECT o_orderkey + {c*max_ok} AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority FROM {rd('orders')}"""
        for c in range(copies)))
    write("lineitem", " UNION ALL ".join(
        f"""SELECT l_orderkey + {c*max_ok} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate FROM {rd('lineitem')}"""
        for c in range(copies)))

    for dim in ("customer", "supplier", "part", "nation", "region"):
        shutil.copyfile(f"{src}/{dim}.parquet", f"{dst}/{dim}.parquet")
        print(f"[gen_scaled] {dim}: copied as-is (dimension)")

if __name__ == "__main__":
    main()
