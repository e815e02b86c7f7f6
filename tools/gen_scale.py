#!/usr/bin/env python3
"""Generate scaled synthetic corpora for the SCALE.md measurement.

Mirrors the marginal distributions of the read-only driver testdata at
/root/testdata/sf0.1 (profiled 2026-08-14; see SCALE.md) at larger
multipliers, so candidate-volume and wall-time measurements run on a
STATIONARY distribution — same vocab, same doc-length range, same
planted near-dup rate, same items-per-order histogram — with only the
corpus size changing. Output dirs are never committed (scaledata/ is
gitignored) and never touch /root/testdata.

Usage: python3 tools/gen_scale.py <outroot> <k> [<k> ...] [--only t1,t2]
                                  [--clustered]
  k = size multiplier vs sf0.1 (k=10 -> "sf1": 6M lineitem, 50k docs)
  --only limits output to the named tables (e.g. embeddings for the
  30x cosine-LSH occupancy check, where the relational fact tables
  would dominate generation time for no measurement). The rng stream
  advances only through GENERATED tables, so an --only run's content
  differs from the same table in a full run — fine for the iid
  synthetic columns these measurements use, but do not mix full and
  --only dirs when exact content reproducibility matters. An --only
  dir is suffixed with "e" (e.g. sf3e) so a partial dir can never be
  mistaken for a full corpus.
  --clustered replaces the isotropic embeddings with a CLUSTERED
  corpus — a mixture of Gaussians on the unit sphere (50 centers,
  Zipf(1)-skewed weights so the hot cluster carries ~22% of the mass,
  per-cluster sigma log-uniform in [0.02, 0.3], with the hot cluster
  PINNED tight at sigma=0.05 so the near-duplicate-blob regime is
  always present). This is the adversarial fixture for the cell/bucket
  families: uniform data cannot exhibit hot-cell candidate skew, and
  every recall number measured on uniform vectors is the friendliest
  case. Label column = true mixture component (ground truth for
  cluster-recovery checks). Implies embeddings only; dirs are suffixed
  "c" (e.g. sf1c) so a clustered corpus is never mistaken for the
  stationary-marginals one.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "row",
         "the", "agg", "key", "query", "a", "scan", "batch"]  # + rare 'dup' marker

# items-per-order histogram measured at sf0.1 (1..17)
ITEMS_HIST = [(1, 11016), (2, 21814), (3, 29500), (4, 29097), (5, 23631),
              (6, 15625), (7, 8941), (8, 4407), (9, 1959), (10, 818),
              (11, 292), (12, 93), (13, 29), (14, 10), (15, 1), (16, 2), (17, 1)]

LANGS = [("en", 0.412), ("zh", 0.151), ("es", 0.149), ("fr", 0.148), ("de", 0.140)]


def wr(outdir, name, table):
    # 12k rows/group keeps even the widest table (64-float embeddings,
    # ~260 B/row) near ~3 MB/group — under graft.Scale's 4 MB
    # byte-range splits, so single-file corpora still read 20+-wide
    rg = 12000 if name == "embeddings" else 40000
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"), row_group_size=rg)
    print(f"  {name}: {table.num_rows} rows")


def gen_clustered(outroot, label, k, seed=20261, blob_sigma=0.05):
    """Mixture-of-Gaussians embeddings (see module docstring)."""
    rng = np.random.default_rng(seed + 7000 + k)
    outdir = os.path.join(outroot, label)
    os.makedirs(outdir, exist_ok=True)
    print(f"== {label} (k={k}, clustered, blob_sigma={blob_sigma}) -> {outdir}")
    n_emb, kc, dim = 2000 * k, 50, 64
    centers = rng.standard_normal((kc, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    weights = 1.0 / np.arange(1, kc + 1, dtype=float)  # Zipf(1)
    weights /= weights.sum()
    sigma = np.exp(rng.uniform(np.log(0.02), np.log(0.3), kc))
    sigma[0] = blob_sigma  # the hot cluster is ALSO a tight near-dup blob:
    # within-blob cosine ~ 1/(1+dim*sigma^2) ~ 0.86, above a 0.8 dedup
    # threshold — the worst case for cell-bounded candidate volume
    cid = rng.choice(kc, n_emb, p=weights)
    v = centers[cid] + sigma[cid, None] * rng.standard_normal((n_emb, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    wr(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(v.astype(np.float32)), type=pa.list_(pa.float32())),
        "label": cid.astype(np.int32)}))


def gen(outroot, label, k, seed=20261, only=None):
    def want(name):
        return only is None or name in only

    rng = np.random.default_rng(seed + k)
    outdir = os.path.join(outroot, label)
    os.makedirs(outdir, exist_ok=True)
    print(f"== {label} (k={k}) -> {outdir}")

    n_cust, n_part, n_supp = 15000 * k, 20000 * k, 1000 * k
    n_orders, n_docs, n_emb, n_events = 150000 * k, 5000 * k, 2000 * k, 100000 * k

    # fixed dims: copy verbatim (region/nation do not scale)
    for t in ("region", "nation"):
        if not want(t):
            continue
        src = pq.read_table(f"/root/testdata/sf0.1/{t}.parquet")
        pq.write_table(src, os.path.join(outdir, f"{t}.parquet"), row_group_size=40000)

    if want("supplier"):
        wr(outdir, "supplier", pa.table({
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    if want("customer"):
        wr(outdir, "customer", pa.table({
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": rng.choice(
                ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"], n_cust)}))

    if want("part"):
        adjectives = ["large", "hot", "blue", "red", "green", "small", "dim", "bright"]
        nouns = ["ring", "bolt", "gear", "cog", "pin", "shaft", "plate", "tube"]
        wr(outdir, "part", pa.table({
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [f"{adjectives[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)],
            "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
            "p_type": rng.choice(
                ["LARGE", "MEDIUM", "ECONOMY", "PROMO", "SMALL", "STANDARD"], n_part),
            "p_size": rng.integers(1, 51, n_part).astype(np.int32),
            "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0}))

    # orders + lineitem share the order-date draw; generate together
    if want("orders") or want("lineitem"):
        # orders: dates uniform over the sf0.1 span, midnight timestamps
        d0 = np.datetime64("1995-01-01")
        odays = rng.integers(0, 2405, n_orders)  # 1995-01-01 .. 2001-08-01
        odate = (d0 + odays.astype("timedelta64[D]")).astype("datetime64[us]")
        if want("orders"):
            wr(outdir, "orders", pa.table({
                "o_orderkey": np.arange(n_orders, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_orders),
                "o_orderstatus": rng.choice(["O", "P", "F"], n_orders),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
                "o_orderdate": odate,
                "o_orderpriority": rng.choice(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_orders)}))

        if want("lineitem"):
            # lineitem: items/order from the empirical histogram
            sizes_v = np.array([s for s, _ in ITEMS_HIST])
            sizes_p = np.array([c for _, c in ITEMS_HIST], dtype=float)
            counts = rng.choice(sizes_v, n_orders, p=sizes_p / sizes_p.sum())
            n_li = int(counts.sum())
            okeys = np.repeat(np.arange(n_orders, dtype=np.int64), counts)
            lnum = (np.arange(n_li) - np.repeat(np.cumsum(counts) - counts, counts) + 1).astype(np.int32)
            sdate = (np.repeat(odate.astype("datetime64[D]"), counts) +
                     rng.integers(1, 96, n_li).astype("timedelta64[D]")).astype("datetime64[us]")
            wr(outdir, "lineitem", pa.table({
                "l_orderkey": okeys,
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_supp, n_li),
                "l_linenumber": lnum,
                "l_quantity": rng.integers(1, 51, n_li).astype(float),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": rng.choice(["A", "N", "R"], n_li),
                "l_linestatus": rng.choice(["O", "F"], n_li),
                "l_shipdate": sdate}))

    if want("events"):
        # events: nanosecond timestamps (the driver testdata is
        # TIMESTAMP(NANOS) parquet, readable only via graft.Tables)
        t0 = np.datetime64("2024-01-01T00:00:00", "ns")
        span_ns = 30 * 24 * 3600 * 10**9
        ets = t0 + rng.integers(0, span_ns, n_events).astype("timedelta64[ns]")
        ets = np.sort(ets)
        wr(outdir, "events", pa.table({
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": ets,
            "user_id": rng.integers(0, 1500 * k, n_events),
            "event_type": rng.choice(["click", "error", "purchase", "signup", "view"], n_events),
            "value": np.round(np.minimum(rng.exponential(50.0, n_events), 599.0), 2),
            "props": [json.dumps({"k": int(v)}) for v in rng.integers(0, 100, n_events)]}))

    if want("documents"):
        # documents: 30-word uniform vocab, lengths U{10..100}, 5% planted
        # near-dups = (random earlier doc) + " dup" — two dups picking the
        # same base become the corpus's exact dups, as at sf0.1
        texts = []
        is_dup = rng.random(n_docs) < 0.05
        for i in range(n_docs):
            if is_dup[i] and i > 0:
                base = int(rng.integers(0, i))
                texts.append(texts[base] + " dup")
            else:
                ln = int(rng.integers(10, 101))
                texts.append(" ".join(rng.choice(VOCAB, ln)))
        langs = rng.choice([l for l, _ in LANGS], n_docs, p=[p for _, p in LANGS])
        wr(outdir, "documents", pa.table({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": [f"src{i % 20}" for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

    if want("embeddings"):
        # embeddings: isotropic unit vectors, dim 64 (matches sf0.1: unit
        # norm, near-zero cross/within-label structure), labels U{0..9}
        v = rng.standard_normal((n_emb, 64)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        wr(outdir, "embeddings", pa.table({
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": rng.integers(0, 10, n_emb).astype(np.int32)}))


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    clustered = "--clustered" in args
    if clustered:
        args.remove("--clustered")
    blob_sigma = 0.05
    if "--blob-sigma" in args:
        i = args.index("--blob-sigma")
        blob_sigma = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    outroot = args[0]
    for karg in args[1:]:
        k = int(karg)
        if clustered:
            # 'i' is RESERVED for the identical-vector blob (sigma == 0);
            # the 0.05 default keeps its bare 'c'; any other sigma is
            # encoded explicitly so the dir name never mislabels the fixture.
            if blob_sigma == 0:
                suffix = "i"
            elif blob_sigma == 0.05:
                suffix = "c"
            else:
                suffix = f"c_s{blob_sigma:g}"
            gen_clustered(outroot, f"sf{k / 10:g}{suffix}", k, blob_sigma=blob_sigma)
        else:
            label = f"sf{k / 10:g}" + ("e" if only is not None else "")
            gen(outroot, label, k, only=only)
