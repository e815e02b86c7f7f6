#!/usr/bin/env python3
"""Real-TEXT near-dup corpus for the round-15 PairCap measurement.

The clustered corpora (gen_scale.py --clustered) are mixtures of
GAUSSIANS: blob members deviate from the center isotropically, which is
the geometry PairCap's sign-key ordering was designed around. Textual
near-dups deviate differently — a paragraph edit swaps a correlated
BLOCK of words, so two near-dups of the same source differ in a few
coordinated features, not iid noise. This tool plants that structure
over the driver sf0.1 documents marginals and derives the embeddings
FROM the text, so the embedding-dedup families are measured on
near-dup geometry that is textual, not synthetic:

  - base: the sf0.1 documents table, verbatim (5,000 docs);
  - one 600-member near-dup FAMILY: one base doc copied 600 times,
    each copy with 1-3 paragraph-level edits (replace a contiguous
    word window with a window from another doc / delete a window /
    duplicate a window) — the over-cap blob, textual geometry;
  - 500 scattered pair dups: distinct base docs, one edited copy each;
  - embeddings.parquet: 64-dim SIGNED feature hashing of word 3-gram
    shingles (SimHash-style random projection, deterministic from the
    text): disjoint shingle sets give E[cos] = 0 (+-1/sqrt(64) noise),
    near-dups sharing most shingles land at cos ~ shared fraction —
    textual overlap IS the cosine;
  - truth.parquet: (src_id, dup_id) planted pairs (the 600-family is
    recorded as copy->source edges; transitivity makes the family one
    truth cluster through the source).

Usage: python3 tools/gen_textdup.py <outdir>   (e.g. scaledata/sf0.1t)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def embed(texts):
    """Signed 3-gram feature hashing -> unit vectors (float32)."""
    out = np.zeros((len(texts), DIM), dtype=np.float64)
    for i, t in enumerate(texts):
        w = t.split()
        v = out[i]
        for j in range(len(w) - 2):
            h = hash((w[j], w[j + 1], w[j + 2])) & 0x7FFFFFFFFFFFFFFF
            v[h % DIM] += 1.0 if (h >> 6) & 1 else -1.0
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
    return out.astype(np.float32)


def edit(rng, words, pool):
    """One paragraph-level edit on a word list (window of 5-15 words)."""
    if len(words) < 20:
        return list(words)
    w = int(rng.integers(5, 16))
    at = int(rng.integers(0, len(words) - w))
    kind = int(rng.integers(0, 3))
    out = list(words)
    if kind == 0:  # replace with a window from another doc
        src = pool[int(rng.integers(0, len(pool)))].split()
        if len(src) > w:
            s = int(rng.integers(0, len(src) - w))
            out[at:at + w] = src[s:s + w]
    elif kind == 1:  # delete the window
        del out[at:at + w]
    else:  # duplicate the window in place
        out[at:at + w] = out[at:at + w] * 2
    return out


def main(outdir):
    # hash() is salted per process unless pinned — determinism matters
    if os.environ.get("PYTHONHASHSEED") != "0":
        os.execve(sys.executable,
                  [sys.executable] + sys.argv, {**os.environ, "PYTHONHASHSEED": "0"})
    rng = np.random.default_rng(20269)
    base = pq.read_table("/root/testdata/sf0.1/documents.parquet")
    os.makedirs(outdir, exist_ok=True)
    ids = base.column("doc_id").to_pylist()
    texts = base.column("text").to_pylist()
    langs = base.column("lang").to_pylist()
    srcs = base.column("source").to_pylist()
    next_id = max(ids) + 1
    new_rows, truth = [], []

    # the 600-member family: longest doc = most room for window edits
    fam_i = max(range(len(texts)), key=lambda i: len(texts[i]))
    fam_words = texts[fam_i].split()
    for _ in range(600):
        w = list(fam_words)
        for _ in range(int(rng.integers(1, 4))):
            w = edit(rng, w, texts)
        new_rows.append((next_id, " ".join(w), langs[fam_i], srcs[fam_i]))
        truth.append((ids[fam_i], next_id))
        next_id += 1

    # 500 scattered pair dups over distinct sources
    picks = rng.choice(len(texts), 500, replace=False)
    for i in picks:
        if i == fam_i:
            continue
        w = edit(rng, texts[i].split(), texts)
        new_rows.append((next_id, " ".join(w), langs[i], srcs[i]))
        truth.append((ids[i], next_id))
        next_id += 1

    all_ids = ids + [r[0] for r in new_rows]
    all_texts = texts + [r[1] for r in new_rows]
    all_langs = langs + [r[2] for r in new_rows]
    all_srcs = srcs + [r[3] for r in new_rows]
    pq.write_table(pa.table({
        "doc_id": pa.array(all_ids, type=pa.int64()),
        "text": pa.array(all_texts, type=pa.string()),
        "lang": pa.array(all_langs, type=pa.string()),
        "source": pa.array(all_srcs, type=pa.string()),
        "n_chars": pa.array([len(t) for t in all_texts], type=pa.int64()),
    }), os.path.join(outdir, "documents.parquet"), row_group_size=40000)
    v = embed(all_texts)
    pq.write_table(pa.table({
        "vec_id": pa.array(all_ids, type=pa.int64()),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(all_ids), type=pa.int32()),
    }), os.path.join(outdir, "embeddings.parquet"), row_group_size=40000)
    pq.write_table(pa.table({
        "src_id": pa.array([a for a, _ in truth], type=pa.int64()),
        "dup_id": pa.array([b for _, b in truth], type=pa.int64()),
    }), os.path.join(outdir, "truth.parquet"), row_group_size=40000)
    print(f"{outdir}: {len(all_ids)} docs ({len(new_rows)} planted), "
          f"{len(truth)} truth pairs")


if __name__ == "__main__":
    main(sys.argv[1])
