"""Deterministic sf1-equivalent testdata generator (scale-proof decade).

The driver ships sf0.001/0.01/0.1 (TESTDATA.md); the scale audit needs
one more decade so every headline query has two sf ratios
(sf0.01→sf0.1→sf1) — a constant-dominated plan can hide superlinear
growth behind a single 10× step over tiny data. /root/testdata is
read-only, so this writes an sf1-EQUIVALENT slice (same schemas, same
distributions, 10× sf0.1 row counts) under the repo
(default .testdata/sf1/, gitignored — ~150 MB regenerates in ~1 min).

Distributions mirror the driver's generator, measured from sf0.1
(tools/gen_scale.py is calibrated against those observed stats, not the
driver's code, which we don't have):

- documents: bag-of-words over the same 30-word vocabulary, word count
  ~ U{10..100}, lang ∈ {en 41%, de/es/fr/zh ~15%}, source ∈ src0..19
  uniform, ~4.6% near-duplicates (an earlier doc + " dup" — the marker
  the driver uses), ~0.16% exact duplicates.
- embeddings: 64-dim unit-normalized N(0,1) vectors (sf0.1's
  within-label cosine is ~0.01: labels are uniform metadata, not
  cluster structure), 10 labels.
- events: ts ~ U[2024-01-01, 2024-01-31) µs precision, 15 users per
  1k events, 5 event types, value ~ Exp(50), props = {"k": U{0..99}}.
- TPC-H-ish star: same key ranges ×10, same categorical frequencies,
  uniform prices/quantities/dates matching observed min/avg/max.

Everything derives from one seeded numpy Generator — same output on
every run, no wall-clock anywhere.

Usage: python tools/gen_scale.py [--out DIR] [--mult N]
  --mult scales row counts relative to the sf0.1 base (default 10).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]
P_NOUN = ["ring", "bolt", "case", "drum", "wheel", "plate", "cap", "tube"]


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    # ~32 row groups per table (r10 verdict #6): a single-row-group file
    # is unsplittable, so the whole parquet DECODE of the 10x slice ran
    # in one task and the two-decade ratios measured input spread, not
    # the operator. With row-group granularity, schemas.load_table reads
    # one split per group and the scan itself parallelizes.
    rows_per_group = max(1024, -(-table.num_rows // 32))
    pq.write_table(table, path, row_group_size=rows_per_group)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts(rng: np.random.Generator, n: int, lo: str, hi: str) -> np.ndarray:
    lo_us = np.datetime64(lo, "us").astype(np.int64)
    hi_us = np.datetime64(hi, "us").astype(np.int64)
    return rng.integers(lo_us, hi_us, n).astype("datetime64[us]")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    counts = rng.integers(10, 101, n)
    # one flat draw, split per doc — vectorized, no per-word python loop
    flat = rng.integers(0, len(VOCAB), int(counts.sum()))
    offs = np.concatenate(([0], np.cumsum(counts)))
    texts = [
        " ".join(VOCAB[w] for w in flat[offs[i] : offs[i + 1]]) for i in range(n)
    ]
    # duplicate injection AFTER base generation, replacing tail docs so
    # every dup points at an earlier doc_id (the winner under min-id
    # dedup, like the driver's data)
    n_near = int(n * 0.046)
    n_exact = max(1, int(n * 0.0016))
    dup_targets = rng.integers(0, n // 2, n_near + n_exact)
    dup_slots = rng.choice(np.arange(n // 2, n), n_near + n_exact, replace=False)
    for k, slot in enumerate(dup_slots):
        src = int(dup_targets[k])
        texts[int(slot)] = texts[src] + " dup" if k < n_near else texts[src]
    langs = rng.choice(LANGS, n, p=LANG_P)
    sources = np.char.add("src", rng.integers(0, 20, n).astype(str))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(_ts(rng, n, "2024-01-01", "2024-01-31")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, n), pa.string()),
            "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
            "props": pa.array(
                np.char.add(
                    np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)), "}"
                ),
                pa.string(),
            ),
        }
    )


def gen_star(rng: np.random.Generator, out: str, mult: int) -> None:
    n_cust, n_part, n_supp = 15_000 * mult, 20_000 * mult, 1_000 * mult
    n_orders = 150_000 * mult

    _write(
        out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
    )
    _write(
        out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
    )
    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust), pa.string()),
            }
        ),
    )
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pa.array(
                    np.char.add(
                        np.char.add(rng.choice(P_ADJ, n_part), " "),
                        rng.choice(P_NOUN, n_part),
                    ),
                    pa.string(),
                ),
                "p_brand": pa.array(
                    np.char.add("Brand#", rng.integers(1, 26, n_part).astype(str)),
                    pa.string(),
                ),
                "p_type": pa.array(rng.choice(P_TYPES, n_part), pa.string()),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
            }
        ),
    )
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
                "o_orderstatus": pa.array(
                    rng.choice(["O", "P", "F"], n_orders), pa.string()
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
                "o_orderdate": pa.array(_ts(rng, n_orders, "1995-01-01", "2001-08-02")),
                "o_orderpriority": pa.array(
                    rng.choice(PRIORITIES, n_orders), pa.string()
                ),
            }
        ),
    )
    # 1..7 lines per order (avg 4 → lineitem ≈ 4× orders, like sf0.1)
    lines_per = rng.integers(1, 8, n_orders)
    n_li = int(lines_per.sum())
    l_orderkey = np.repeat(np.arange(n_orders), lines_per)
    l_linenumber = (
        np.arange(n_li) - np.repeat(np.concatenate(([0], np.cumsum(lines_per)[:-1])), lines_per) + 1
    )
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(l_linenumber.astype(np.int32), pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
                "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
                "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li), pa.string()),
                "l_linestatus": pa.array(rng.choice(["O", "F"], n_li), pa.string()),
                "l_shipdate": pa.array(_ts(rng, n_li, "1995-01-02", "2001-11-05")),
            }
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--out", default=os.path.join(repo, ".testdata", "sf1"))
    ap.add_argument("--mult", type=int, default=10, help="multiple of sf0.1 sizes")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    print(f"generating sf{args.mult / 10:g}-equivalent data in {args.out}")
    gen_star(rng, args.out, args.mult)
    _write(args.out, "events", gen_events(rng, 100_000 * args.mult, 1_500 * args.mult))
    _write(args.out, "documents", gen_documents(rng, 5_000 * args.mult))
    _write(args.out, "embeddings", gen_embeddings(rng, 2_000 * args.mult))
    print("done")


if __name__ == "__main__":
    main()
