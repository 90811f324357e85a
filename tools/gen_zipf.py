#!/usr/bin/env python3
"""Generate a Zipfian-vocabulary corpus into /tmp/zipf (documents only).

Dev-side only (numpy/pyarrow live in the system python; the library
itself never depends on them). Deterministic: seed 20260815.

Purpose (SCALE.md round 12): the driver corpus has a ~31-token
synthetic vocabulary, so every bulk-BM25 scale claim was extrapolation
— with 31 tokens every term is a head term and Σ df·qf degenerates.
Real text is Zipfian: a handful of stopword-like head terms with
df ≈ N, and a long tail of informative terms with tiny df. This
corpus makes that distribution real:

  - 50,000 docs (sf1-equivalent count), 80-200 words each
  - vocabulary: 50,000 distinct tokens, token frequencies ~ Zipf,
    exponent s = 1.1 (bounded inverse-CDF over ranks, not
    np.random.zipf's unbounded tail)
  - surface forms are SYLLABLE words, not "wNNNNNN": each vocab id maps
    injectively to a consonant-vowel syllable string (mixed-radix
    decode of the id over 100 CV syllables), so rank-0 head words are
    SHORT (2-4 chars, like real stopwords) and the character-level
    n-gram entropy is prose-like. The first corpus revision used
    zero-padded "w012345" names whose shared "w0..." prefixes made
    8-char shingles collide far beyond real text — the minhash probe
    measured band-collision pathology, not corpus scale (recorded as a
    caveat in SCALE.md r12; this revision removes it). Token-level
    stats (df, qf, Zipf shares) are IDENTICAL in distribution — only
    the spelling of each token changed.

Expected shape the probe must show: the AUTO salt engages ONLY on the
head terms (df·qf above the balance budget), the tail stays unsalted,
and the exact (uncapped) bulk run completes.
"""
import os
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Usage: gen_zipf.py [out_dir] [n_docs]
#   default: the 50k-doc probe corpus at /tmp/zipf
#   the STANDING repo asset (testdata-aux/zipf) is the same law at
#   5,000 docs (sf0.1 document count), committed so specs and probes
#   can target realistic token statistics without regenerating —
#   regenerate with: python3 tools/gen_zipf.py testdata-aux/zipf 5000
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipf"
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
VOCAB = 50_000
S = 1.1
SEED = 20260815


CONSONANTS = "bcdfghjklmnpqrstvwxz"  # 20
VOWELS = "aeiou"                     # 5
SYLLABLES = [c + v for c in CONSONANTS for v in VOWELS]  # 100


def syllable_word(i):
    """Injective id -> syllable word: mixed-radix digits of i over the
    100 CV syllables (most-significant first), minimum one syllable.
    Distinct ids yield distinct words (no-leading-zero ambiguity is
    avoided by offsetting each extra digit: this is bijective base-100
    numeration)."""
    parts = []
    i += 1
    while i > 0:
        i -= 1
        parts.append(SYLLABLES[i % 100])
        i //= 100
    return "".join(reversed(parts))


def main():
    rng = np.random.default_rng(SEED)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = ranks ** -S
    p /= p.sum()
    words = np.array([syllable_word(i) for i in range(VOCAB)])
    assert len(set(words)) == VOCAB
    lengths = rng.integers(80, 201, size=N_DOCS)
    # one bulk draw of all tokens, then split per doc (fast + identical
    # distribution to per-doc draws)
    flat = rng.choice(VOCAB, size=int(lengths.sum()), p=p)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    texts = [" ".join(words[flat[offs[i]:offs[i + 1]]])
             for i in range(N_DOCS)]
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * N_DOCS),
        "source": pa.array(["zipf"] * N_DOCS),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    }), f"{OUT}/documents.parquet")
    # distribution report for SCALE.md
    uniq, cnt = np.unique(flat, return_counts=True)
    order = np.argsort(-cnt)
    print(f"docs={N_DOCS} vocab_used={len(uniq)} tokens={len(flat)}")
    print("top-5 token shares:",
          [round(c / len(flat), 4) for c in cnt[order][:5]])


if __name__ == "__main__":
    main()
