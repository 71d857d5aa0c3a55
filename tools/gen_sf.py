#!/usr/bin/env python3
"""Scale-factor testdata generator for scales the driver does not supply.

Usage: python3 tools/gen_sf.py <sf> <outDir> [seed] [--vocab zipf50k] [--only documents]
e.g.   python3 tools/gen_sf.py 1 /tmp/graft/sf1
       python3 tools/gen_sf.py 10 /tmp/graft/sf10zipf 20260815 --vocab zipf50k --only documents

--vocab zipf50k swaps the documents vocabulary from the driver's 31-word
uniform toy (which SATURATES: every 3-gram shingle's document frequency
grows linearly with the corpus, so exact pair-enumeration rungs go
output-quadratic by construction) to a Zipf(1.07) distribution over 50k
synthetic word forms — the realistic-corpus shape where shingle df is
bounded and the exact dedup ladder can actually be demonstrated at sf10
(r15 verdict #6). --only documents skips the other tables (the dedup
rungs read only documents).

Reproduces the driver's synthetic-table distributions (TESTDATA.md tables,
profiled from /root/testdata/sf0.1) at an arbitrary scale factor so the
100 TB scale story can be *measured* above sf0.1 instead of argued:

  table       rows(sf)            notes
  region      5                   fixed dim (copied verbatim from sf0.1)
  nation      25                  fixed dim (copied verbatim from sf0.1)
  customer    150,000 * sf        acctbal U(-1000,10000) 2dec, 5 segments
  supplier    10,000  * sf        acctbal U(-1000,10000) 2dec
  part        200,000 * sf        8x8 names, 25 brands, 6 types, size 1..50,
                                  retailprice U(900,1000) 1dec
  orders      1,500,000 * sf      custkey uniform (Poisson ~10/cust), status
                                  O/P/F, totalprice U(1000,500000) 2dec,
                                  orderdate U(1995-01-01 .. 2001-08-01)
  lineitem    6,000,000 * sf      orderkey uniform (Poisson ~4/order),
                                  linenumber 1..7, qty int 1..50,
                                  extprice U(900,105000) 2dec, disc 0..0.10,
                                  tax 0..0.08, flag A/N/R, status F/O,
                                  shipdate = U(orderdate range) + U(1..95)d
  events      1,000,000 * sf      users = 10% of customers, 5 types uniform,
                                  ts U(Jan 1..31 2024) us-precision,
                                  value ~ Exp(mean 50) 2dec, props {"k": 0..99}
  documents   50,000  * sf        10..100 words from the 30-word uniform vocab
                                  + rare token 'dup' (w=0.028), langs
                                  en .41 / zh .15 / es .15 / fr .15 / de .14,
                                  20 exactly-balanced sources, ~0.16% of docs
                                  are exact-text copies of an earlier doc
  embeddings  max(500, 2,000*4^log10(10sf))  64-dim unit float32, labels 0..9,
                                  weak cluster structure (intra-cos ~0.07)

Same parquet physics as the driver files: one file per table, single row
group arrow write, timestamp[us], list<float> embeddings.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]

DAY_US = 86_400_000_000
ORDER_EPOCH_LO = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
ORDER_DAYS = 2404  # 1995-01-01 .. 2001-08-01 inclusive
EVENT_LO = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EVENT_SPAN_US = 30 * DAY_US


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def r2(x):
    return np.round(x, 2)


def doc_vocab(kind, rng):
    """(vocab array, probability array) for the documents table."""
    if kind == "toy":
        vocab = np.array(VOCAB + ["dup"])
        w = np.ones(len(vocab))
        w[-1] = 0.028
        return vocab, w / w.sum()
    if kind == "zipf50k":
        # Zipf-Mandelbrot over 50k synthetic forms: p_i ∝ 1/(i+2.7)^1.07
        # (English-like exponent/shift). Forms are deterministic 5-hex
        # tags — the dedup/text operators tokenize on whitespace, so the
        # shape of the distribution is what matters, not the letters.
        # 'dup' keeps its absolute toy-corpus rate so the planted-dup
        # queries keep firing on this corpus too.
        n = 50_000
        ranks = np.arange(n, dtype=np.float64)
        w = 1.0 / (ranks + 2.7) ** 1.07
        vocab = np.array([f"w{i:05x}" for i in range(n)] + ["dup"])
        w = np.concatenate([w / w.sum() * (1 - 0.028 / 31), [0.028 / 31]])
        return vocab, w / w.sum()
    raise SystemExit(f"unknown --vocab {kind!r} (toy | zipf50k)")


def gen_documents(sf, out, rng, vocab_kind):
    """Word salad over the chosen vocab + planted exact dups. Draw order
    is IDENTICAL to the original inline block — a full default run must
    reproduce existing dirs (sf30's bit-image artifacts) byte for byte."""
    n_doc = int(50_000 * sf)
    vocab, w = doc_vocab(vocab_kind, rng)
    lens = rng.integers(10, 101, n_doc)
    words = rng.choice(vocab, lens.sum(), p=w)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    n_dup = int(round(0.0016 * n_doc))
    for tgt in rng.choice(np.arange(1, n_doc), n_dup, replace=False):
        texts[tgt] = texts[rng.integers(0, tgt)]
    src = np.array([f"src{i % 20}" for i in range(n_doc)])
    rng.shuffle(src)
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array(src),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))


def gen(sf, out, seed, vocab_kind="toy", only=None):
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    if only is not None:
        # Documents-only mode consumes the rng from a FRESH state, so its
        # content differs from the documents table of a full run at the
        # same seed — it generates a new corpus variant, it is never a
        # way to regenerate one table of an existing dir.
        assert set(only) == {"documents"}, "--only supports documents"
        gen_documents(sf, out, rng, vocab_kind)
        return

    for dim in ("region", "nation"):
        shutil.copyfile(f"/root/testdata/sf0.1/{dim}.parquet",
                        os.path.join(out, f"{dim}.parquet"))
        print(f"  {dim}: copied fixed dim")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = max(1, n_cust // 10)
    n_emb = int(2_000 * 4 ** np.log10(10 * sf)) if sf >= 0.01 else 500

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": r2(rng.uniform(-1000, 10000, n_cust)),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
    }))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": r2(rng.uniform(-1000, 10000, n_supp)),
    }))

    names = [f"{a} {n}" for a in P_ADJ for n in P_NOUN]
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(rng.choice(names, n_part)),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(P_TYPES, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
    }))

    o_date = ORDER_EPOCH_LO + rng.integers(0, ORDER_DAYS, n_ord) * DAY_US
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
        "o_totalprice": r2(rng.uniform(1000, 500000, n_ord)),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord)),
    }))

    ship = (ORDER_EPOCH_LO + rng.integers(0, ORDER_DAYS, n_li) * DAY_US
            + rng.integers(1, 96, n_li) * DAY_US)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": r2(rng.uniform(900, 105000, n_li)),
        "l_discount": r2(rng.integers(0, 11, n_li) / 100.0),
        "l_tax": r2(rng.integers(0, 9, n_li) / 100.0),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    ts = EVENT_LO + rng.integers(0, EVENT_SPAN_US, n_ev)
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(np.sort(ts), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], n_ev)),
        "value": r2(rng.exponential(50.0, n_ev)),
        "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: word salad, chosen vocab + rare 'dup' token, planted exact dups
    gen_documents(sf, out, rng, vocab_kind)

    # embeddings: unit 64-dim float32, 10 weak clusters (intra-cos ~0.07)
    cents = rng.normal(size=(10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = 0.0702 * cents[labels] + rng.normal(size=(n_emb, 64)) / 8.0
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = sys.argv[1:]
    sf = float(args[0])
    out = args[1]
    seed = int(args[2]) if len(args) > 2 else 20260815
    vocab_kind = (flags[flags.index("--vocab") + 1]
                  if "--vocab" in flags else "toy")
    only = ({flags[flags.index("--only") + 1]}
            if "--only" in flags else None)
    print(f"gen_sf: sf={sf} -> {out} (seed {seed}, vocab {vocab_kind}"
          + (f", only {sorted(only)}" if only else "") + ")")
    gen(sf, out, seed, vocab_kind, only)
