#!/usr/bin/env python3
"""Synthesize a FACTOR-x scale-up of a testdata SF directory for the
scale-stress runs (BASELINE.md "measured scaling" section).

Usage: python3 scripts/synth_scale.py <srcDir> <outDir> <factor>

Replication scheme: each table is written as a DIRECTORY of parquet files
(one per replica k = 0..factor-1, so Spark parallelizes the scan), with
every join/identity key offset by k * 10_000_000 — replicas are DISJOINT
id spaces, so joins, groupings, and graph components scale linearly by
construction (the honest shape of "more of the same corpus", not a
pathological clone explosion).

documents.text is additionally PERTURBED per replica (k > 0): a replica
salt token is inserted every 5 words. Without this, every doc would have
factor-1 EXACT clones and the near-dup pair graph would grow
quadratically in factor (a (10c choose 2) blow-up per dup cluster) —
which would measure clone-pathology, not scale. With the insertion,
cross-replica 3-shingle Jaccard drops to ~0.4 < the 0.7 gate threshold,
so verified near-dup structure stays per-replica and pair counts scale
linearly (banding candidates gain a bounded constant per doc). n_chars is
recomputed to stay consistent with the perturbed text.

All ten tables are synthesized, so the FULL gate suite can run at any
factor: region/nation copy verbatim (dimension tables — customer and
supplier keep their original nationkeys, which stay valid); customer /
supplier / part / orders / lineitem / events / documents / embeddings
replicate with offset keys. embeddings keep their vectors identical
across replicas: a replica group is a 10-clone cosine-1 clique, so
near-dup pair growth stays LINEAR (factor·(factor-1)/2 pairs per group,
a constant per base vector), and ANN gates see a denser but not
pathological candidate structure.
"""
import os
import shutil
import sys

import duckdb

OFF = 10_000_000


def main(src, out, factor):
    con = duckdb.connect()
    os.makedirs(out, exist_ok=True)

    def write(table, k, select):
        d = os.path.join(out, f"{table}.parquet")
        if k == 0 and os.path.isdir(d):
            # re-running into an existing outDir with a smaller factor
            # must not leave stale higher-k replicas behind
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        con.execute(
            f"COPY ({select}) TO '{d}/part-{k:03d}.parquet' (FORMAT PARQUET)")

    # straight copies (dimensions / warmup fodder)
    for t in ["region", "nation"]:
        write(t, 0, f"SELECT * FROM '{src}/{t}.parquet'")

    for k in range(factor):
        o = k * OFF
        write("customer", k, f"""
            SELECT c_custkey + {o} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet'""")
        write("part", k, f"""
            SELECT p_partkey + {o} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM '{src}/part.parquet'""")
        write("embeddings", k, f"""
            SELECT vec_id + {o} AS vec_id, embedding, label
            FROM '{src}/embeddings.parquet'""")
        write("supplier", k, f"""
            SELECT s_suppkey + {o} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM '{src}/supplier.parquet'""")
        write("orders", k, f"""
            SELECT o_orderkey + {o} AS o_orderkey,
                   o_custkey + {o} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{src}/orders.parquet'""")
        write("lineitem", k, f"""
            SELECT l_orderkey + {o} AS l_orderkey,
                   l_partkey + {o} AS l_partkey,
                   l_suppkey + {o} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet'""")
        write("events", k, f"""
            SELECT event_id + {o} AS event_id, ts,
                   user_id + {o} AS user_id, event_type, value, props
            FROM '{src}/events.parquet'""")
        if k == 0:
            text = "text"
        else:
            # insert a replica salt token after every 5 words: breaks
            # enough 3-shingles that cross-replica Jaccard < banding
            # thresholds while preserving within-replica dup structure
            text = (r"regexp_replace(text, '((?:\S+ ){5})', "
                    f"'\\1zq{k}x ', 'g')")
        write("documents", k, f"""
            SELECT doc_id + {o} AS doc_id, {text} AS text, lang, source,
                   LENGTH({text})::BIGINT AS n_chars
            FROM '{src}/documents.parquet'""")
    print(f"synthesized {factor}x of {src} -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
