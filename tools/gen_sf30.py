#!/usr/bin/env python3
"""Generate the sf30 scale-rehearsal corpus (30x sf1) into
/tmp/sf30 — the fourth decade step for SCALE.md's growth-shape
check. Same construction as gen_sf1.py (histogram replicated 100x,
three beyond-cap mega-blocks, same vocabulary/length distribution),
different seed. Dev-side only."""
import os
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sf30"
REPL = 300  # histogram replication (sf1 used 10, sf3 used 30)

HIST = {1: 89, 2: 38, 3: 14, 4: 15, 5: 10, 6: 8, 7: 5, 8: 10, 9: 10, 10: 7,
        11: 4, 12: 2, 13: 2, 15: 2, 16: 1, 17: 5, 18: 2, 21: 2, 22: 1, 25: 1,
        27: 1, 30: 1, 31: 1, 33: 1, 34: 1, 36: 1, 42: 1, 43: 1, 44: 1, 47: 1,
        60: 2, 63: 1, 66: 1, 68: 1, 76: 3, 81: 1, 86: 1, 87: 1, 88: 1, 90: 1,
        94: 1, 100: 1, 104: 1, 121: 1, 133: 1, 151: 1, 165: 1, 173: 1,
        190: 1, 194: 1, 197: 1, 239: 1, 240: 1, 250: 1, 315: 1}


def main():
    rng = np.random.default_rng(20260815)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'").fetch_df()
    vocab = sorted({w for t in docs["text"] for w in t.split(" ") if w})
    langs = sorted(docs["lang"].unique())
    sources = sorted(docs["source"].unique())
    wc = [len(t.split(" ")) for t in docs["text"]]

    fam_sizes = [s for size, n in HIST.items() for s in [size] * (n * REPL)]
    fam_sizes += [2000, 2500, 3000, 3500]  # beyond-cap mega-blocks, on purpose
    rng.shuffle(fam_sizes)

    texts, doc_lang, doc_src = [], [], []
    for size in fam_sizes:
        base = list(rng.choice(vocab, size=int(rng.choice(wc))))
        lang, src = str(rng.choice(langs)), str(rng.choice(sources))
        for k in range(size):
            d = list(base)
            if k > 0:  # near-dup: substitute 1-3 words
                for _ in range(int(rng.integers(1, 4))):
                    d[int(rng.integers(0, len(d)))] = str(rng.choice(vocab))
            texts.append(" ".join(d))
            doc_lang.append(lang)
            doc_src.append(src)

    order = rng.permutation(len(texts))
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array([texts[i] for i in order]),
        "lang": pa.array([doc_lang[i] for i in order]),
        "source": pa.array([doc_src[i] for i in order]),
        "n_chars": pa.array(np.array([len(texts[i]) for i in order],
                                     dtype=np.int64)),
    }), f"{OUT}/documents.parquet")
    print("docs:", len(texts))

    m, dim, n_clusters = 600000, 64, 18000
    bases = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    vecs = np.empty((m, dim), dtype=np.float32)
    labels = np.empty(m, dtype=np.int32)
    for i in range(m):
        if i < n_clusters * 4:
            c = i % n_clusters
            vecs[i] = bases[c] + rng.normal(scale=0.05, size=dim).astype(np.float32)
            labels[i] = c % 10
        else:
            vecs[i] = rng.normal(size=dim)
            labels[i] = int(rng.integers(0, 10))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(m, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    }), f"{OUT}/embeddings.parquet")
    print("embeddings:", m)


if __name__ == "__main__":
    main()
