#!/usr/bin/env python3
"""10^6-copy identical-vector blob corpus (round-15 `blob_cap` point).

1,000,000 bit-identical unit vectors (label 0 — the blob no Voronoi
assignment can split and no all-pairs branch survives: C(10^6, 2) ~
5*10^11 pairs) plus 200,000 isotropic noise vectors (label 1) for
context. The full 4.5M-vector sf225i mixture exceeded this box's disk
on the 16-table bucket shuffle; the blob REGIME — which is what the
measurement targets — is unchanged by the surrounding corpus size.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

rng = np.random.default_rng(20271)
dim = 64
n_blob, n_noise = 1000000, 200000
c = rng.standard_normal(dim)
c /= np.linalg.norm(c)
blob = np.tile(c.astype(np.float32), (n_blob, 1))
noise = rng.standard_normal((n_noise, dim))
noise /= np.linalg.norm(noise, axis=1, keepdims=True)
v = np.vstack([blob, noise.astype(np.float32)])
lab = np.concatenate([np.zeros(n_blob, np.int32), np.ones(n_noise, np.int32)])
# Interleave blob and noise rows: blob-only row groups compress to
# almost nothing (identical lists RLE away), so without the shuffle 25
# of the 30 row groups start inside 1-2 of Spark's byte-range splits
# and the 1M blob rows land in TWO read partitions — the measurement
# box then serializes the projection stages a balanced layout (what
# any real multi-file corpus has) runs 32-wide. Row content is
# unchanged; vec_id keeps its label pairing.
perm = rng.permutation(len(v))
v, lab = v[perm], lab[perm]
ids = np.arange(len(v), dtype=np.int64)[perm]
out = "scaledata/sf-blob1m"
os.makedirs(out, exist_ok=True)
pq.write_table(pa.table({
    "vec_id": ids,
    "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
    "label": lab}), f"{out}/embeddings.parquet", row_group_size=40000)
print("wrote", len(v))
