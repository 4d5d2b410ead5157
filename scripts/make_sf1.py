#!/usr/bin/env python3
"""Synthesize a 10x scale-up of sf0.1 under target/sf1 for the one-off
scale smoke bench (PERF.md "10x scale check").

Key-coherent shifts: fact keys (o_orderkey/l_orderkey, doc_id, vec_id,
event_id, user_id) shift by replica*1e9 so joins neither collide nor
multiply; dimension tables stay fixed (TPC-H dims grow sublinearly).
Replica text gets a one-token suffix and embeddings a 1e-4/dim offset so
replicas are near- (not exact-) duplicates — NOTE this still makes every
original a 10-way near-dup, so pair-generating dedup queries see ~45x
candidate growth by construction (see PERF.md).

Usage: python3 scripts/make_sf1.py [src_dir] [dst_dir]
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
G, R = 1000000000, 10

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part"]:
    con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")


def rep(template: str) -> str:
    return " UNION ALL ".join(
        template.replace("@S", f"CAST({i * G} AS BIGINT)").replace("@I", str(i)) for i in range(R)
    )


con.sql(f"""COPY ({rep(f"SELECT o_orderkey + @S AS o_orderkey, o_custkey, o_orderstatus,"
                       f" o_totalprice, o_orderdate, o_orderpriority FROM '{src}/orders.parquet'")})
            TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY ({rep(f"SELECT l_orderkey + @S AS l_orderkey, l_partkey, l_suppkey, l_linenumber,"
                       f" l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
                       f" l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'")})
            TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY ({rep(f"SELECT doc_id + @S AS doc_id,"
                       f" text || CASE WHEN @I=0 THEN '' ELSE ' r@I' END AS text,"
                       f" lang, source, n_chars FROM '{src}/documents.parquet'")})
            TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY ({rep(f"SELECT vec_id + @S AS vec_id,"
                       f" list_transform(embedding, x -> CAST(x + @I*0.0001 AS FLOAT)) AS embedding,"
                       f" label FROM '{src}/embeddings.parquet'")})
            TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

# events via pyarrow: the TIMESTAMP(NANOS) physical type must survive
# (Engine.table reads it with nanosAsLong + `ts div 1000`)
t = pq.read_table(f"{src}/events.parquet")
parts = []
for i in range(R):
    p = t.set_column(t.schema.get_field_index("event_id"), "event_id", pc.add(t["event_id"], i * G))
    p = p.set_column(p.schema.get_field_index("user_id"), "user_id", pc.add(p["user_id"], i * G))
    parts.append(p)
pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet")
print("done:", dst)
