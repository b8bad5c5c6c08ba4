"""Generate a larger scale factor of the driver's synthetic fixture
layout (TESTDATA.md) for LOCAL scale measurement — the sf1 point the
SCALE.md linearity table needs (r8 verdict item #1).

The driver's own generator is not in this repo, so this reproduces the
OBSERVED schemas, key-range scaling rules, and distributions of
/root/testdata/sf{0.001,0.01,0.1} (measured in-round; see SCALE.md):

- row counts scale linearly with sf: lineitem = 6,000,000*sf = 4x
  orders; customer = 150,000*sf; part = 200,000*sf; supplier =
  10,000*sf; events = 1,000,000*sf over 15,000*sf users within
  2024-01; documents = 50,000*sf; embeddings = 20,000*sf (dim-64 unit
  vectors, 10 labels); nation/region fixed at 25/5.
- documents use the same 31-word vocabulary, 10-100 words/doc, the
  same language skew (en ~41%, zh/es/fr/de ~15% each), 20 uniform
  sources, and a duplicate tail (~0.2% exact copies, ~4% mutated
  near-copies) so dedup operators see comparable candidate densities.

Output values are NOT row-identical to the driver's fixtures (seeds
differ) — this dataset is a PERFORMANCE scale point, never a
correctness oracle input; correctness stays pinned to the driver's
sf0.01.  Deterministic: seed 42.

Usage:  python tools/gen_fixture.py SF OUT_DIR   (e.g. 1 /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "join group line vector data spark fast small merge column batch "
    "sort table part order key query filter stream hash value agg "
    "customer window slow big scan a row the shuffle"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
PNAMES_A = ["large", "hot", "blue", "red", "green", "small", "dark", "light"]
PNAMES_B = ["ring", "bolt", "case", "tube", "box", "cap", "disk", "plate"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


#: Rows per parquet row group.  pyarrow's default (1 Mi rows) writes any
#: table under ~1 M rows as ONE row group — and parquet reads are
#: row-group atomic, so Spark's byte-range splits all land on a single
#: task no matter how many cores ask (r15: `sim_cosine_topk` at sf30 ran
#: its whole 120 M-row scoring stage on 1 of 32 tasks for 39 minutes).
#: Real lake files carry many row groups; 128 Ki keeps every ≥ 4 M-row
#: fixture table at ≥ 32-way scan parallelism while staying large enough
#: that per-group overhead is noise.  Smaller tables are handled by
#: readers.spread_small_input's row-group gate.
ROW_GROUP_ROWS = 131_072


#: --only filter (r17): tables NOT listed are still fully DRAWN (the
#: single seeded RNG stream must advance identically or every later
#: table's bytes change vs prior rounds' full fixtures) but not encoded
#: or written — targeted probes (e.g. the LSH frontier needs only
#: embeddings, the graph guard only documents) stop paying the
#: multi-GB lineitem/events parquet bill.
ONLY_TABLES: set[str] | None = None


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    if ONLY_TABLES is not None and name not in ONLY_TABLES:
        print(f"  {name}: {table.num_rows:,} rows (drawn, skipped)")
        return
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=ROW_GROUP_ROWS,
    )
    print(f"  {name}: {table.num_rows:,} rows")


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = 4 * n_ord
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": NATIONS,
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.randint(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.randint(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.randint(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{PNAMES_A[i % 8]} {PNAMES_B[(i // 8) % 8]}"
            for i in range(n_part)
        ],
        "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
        "p_type": np.array(PTYPES)[rng.randint(0, 6, n_part)],
        "p_size": rng.randint(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1000, 2),
    }))

    day_us = 86_400_000_000
    o_dates = (
        np.datetime64("1995-01-01", "us")
        + (rng.randint(0, 2404, n_ord) * day_us).astype("timedelta64[us]")
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.randint(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(["P", "O", "F"])[rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 450_000, n_ord), 2),
        "o_orderdate": o_dates,
        "o_orderpriority": np.array(PRIORITIES)[rng.randint(0, 5, n_ord)],
    }))

    s_dates = (
        np.datetime64("1995-01-01", "us")
        + (rng.randint(1, 2500, n_li) * day_us).astype("timedelta64[us]")
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": rng.randint(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.randint(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.randint(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.randint(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["N", "R", "A"])[rng.randint(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.randint(0, 2, n_li)],
        "l_shipdate": s_dates,
    }))

    ev_ts = (
        np.datetime64("2024-01-01", "us")
        + np.sort(rng.randint(0, 30 * day_us, n_ev)).astype("timedelta64[us]")
    )
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ev_ts,
        "user_id": rng.randint(0, n_users, n_ev).astype(np.int64),
        "event_type": np.array(EVENT_TYPES)[rng.randint(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 200, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)],
    }))

    # documents: same vocab/lengths, with a duplicate tail for dedup ops
    vocab = np.array(VOCAB[:31])
    lens = rng.randint(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random_sample()
        if i > 10 and r < 0.002:  # exact duplicate
            texts.append(texts[rng.randint(0, i)])
        elif i > 10 and r < 0.042:  # near duplicate: mutate a few words
            w = texts[rng.randint(0, i)].split()
            for _ in range(max(1, len(w) // 20)):
                w[rng.randint(0, len(w))] = vocab[rng.randint(0, 31)]
            texts.append(" ".join(w))
        else:
            texts.append(" ".join(vocab[rng.randint(0, 31, lens[i])]))
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(5, n_doc, p=LANG_P).astype(np.int64)
        ],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    E = rng.standard_normal((n_emb, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(E), type=pa.list_(pa.float32())),
        "label": rng.randint(0, 10, n_emb).astype(np.int32),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")),
        None,
    )
    if only:
        ONLY_TABLES = set(only.split(","))
    sf = float(args[0]) if args else 1.0
    out = args[1] if len(args) > 1 else f"/tmp/spark-graft-sf{sf}"
    print(f"generating sf={sf} into {out}" + (f" (only {only})" if only else ""))
    generate(sf, out)
