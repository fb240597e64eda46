"""Generate a statistically-matched larger scale factor of the driver's
synthetic testdata (TESTDATA.md) for LOCAL MEASUREMENT ONLY.

The driver's round-end bench may run at sf1.0 (BENCH_r06.json: "sf": "1.0"),
but /root/testdata only ships sf{0.001,0.01,0.1}. This script reproduces the
schema, key ranges and value distributions observed in sf0.1 (inspected with
pyarrow; see OPTIMIZATION_r07.md "Measurement setup") scaled by --factor, so
bench_extra.py can time queries at driver scale. It is NOT used by bench.py,
oracle checks, or any query path — purely a measurement fixture generator.

Usage: python scripts/gen_scaled_testdata.py --out /root/testdata_gen/sf1.0 \
          --factor 10 [--seed 42]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
MKT = ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE", "MACHINERY"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "hot", "small", "cold", "dim", "bright", "old", "new"]
P_NOUN = ["ring", "bolt", "cap", "gear", "pin", "rod", "cog", "nut"]
P_TYPE = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lens = rng.integers(10, 101, n)
    words = rng.integers(0, len(VOCAB), int(lens.sum()))
    vocab = np.array(VOCAB)
    texts, off = [], 0
    for ln in lens:
        texts.append(" ".join(vocab[words[off:off + ln]]))
        off += ln
    lang = rng.choice(LANGS, n, p=LANG_P)
    ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "doc_id": ids,
        "text": texts,
        "lang": lang,
        "source": [f"src{i % 20}" for i in ids],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 10**6
    ts = base + rng.integers(0, span_us, n).astype("timedelta64[us]")
    return pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "event_type": rng.choice(EVENT_TYPES, n),
        "value": np.round(rng.uniform(0, 560, n), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)],
    })


def gen_tpch(rng: np.random.Generator, out: str, f: int) -> None:
    n_cust, n_ord, n_li = 15000 * f, 150000 * f, 600000 * f
    n_part, n_supp = 20000 * f, 1000 * f
    write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(MKT, n_cust),
    }))
    day = 24 * 3600 * 10**6
    obase = np.datetime64("1995-01-01T00:00:00", "us")
    write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["P", "O", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(900, 500000, n_ord), 2),
        "o_orderdate": obase + (rng.integers(0, 2405, n_ord) * day).astype("timedelta64[us]"),
        "o_orderpriority": rng.choice(PRIO, n_ord),
    }))
    write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": obase + (rng.integers(1, 2500, n_li) * day).astype("timedelta64[us]"),
    }))
    write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{P_ADJ[i % 8]} {P_NOUN[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25 + 1}" for i in range(n_part)],
        "p_type": rng.choice(P_TYPE, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))
    write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    f = args.factor
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    write(args.out, "documents", gen_documents(rng, 5000 * f))
    write(args.out, "events", gen_events(rng, 100000 * f, 1500 * f))
    emb = rng.normal(0, 0.12, (2000 * f, 64)).astype(np.float32)
    write(args.out, "embeddings", pa.table({
        "vec_id": np.arange(2000 * f, dtype=np.int64),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, 2000 * f).astype(np.int32),
    }))
    gen_tpch(rng, args.out, f)
    for small in ("nation", "region"):
        shutil.copy(os.path.join(SRC, f"{small}.parquet"),
                    os.path.join(args.out, f"{small}.parquet"))
        print(f"{small}: copied from sf0.1")
    open(os.path.join(args.out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
