"""Generate scale-up test tables with the driver generator's shape.

The driver's synthetic tables (TESTDATA.md) stop at sf0.1; the heavy
dedup/ANN tail needs an empirical scaling slope (VERDICT r5 item 2).
This reproduces the OBSERVED generation law of ``documents`` and
``embeddings`` at any scale factor, seeded and deterministic:

documents (50k rows/sf1): uniform 10-100 word texts over the 30-word
  vocabulary measured at sf0.1, lang ~ the sf0.1 empirical marginal,
  source = src{doc_id % 20}, and a 5% near-duplicate rate realized as
  "copy another doc's text + the ' dup' marker token" — the structure
  d02/d26/d35 detect (measured: 25 'dup' docs per 500 at sf0.01,
  trigram-Jaccard ~0.9-0.99 to their partner).

embeddings (20k rows/sf1): 64-dim unit vectors, label ~ uniform(10)
  with a weak per-label centroid shift (sf0.1 centroid norms ~0.07; no
  high-cosine pairs — max pairwise cosine at sf0.01 is 0.51).

Only the two tables the heavy tail reads are generated; the rest are
symlinked from the base sf0.1 directory so the full bench harness can
still run against the output dir.

Usage: python scripts/gen_scale.py SF OUT_DIR [--seed 4242]
   eg: python scripts/gen_scale.py 1 /root/repo/.scale/sf1
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "order", "group", "join", "key", "row", "data", "hash",
    "sort", "filter", "agg", "scan", "batch", "query", "a", "small",
    "big", "fast", "slow", "line", "part", "customer", "the",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
DUP_RATE = 0.05


def gen_documents(n: int, rng: np.random.Generator):
    texts: list[str] = []
    langs = [LANGS[i] for i in rng.choice(len(LANGS), size=n, p=LANG_P)]
    lens = rng.integers(10, 101, size=n)
    vocab = np.array(VOCAB)
    for i in range(n):
        if i > 0 and rng.random() < DUP_RATE:
            # near-duplicate: copy an earlier doc, append the marker
            src = int(rng.integers(0, i))
            texts.append(texts[src] + " dup")
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator, dim: int = 64,
                   k_labels: int = 10):
    centroids = rng.standard_normal((k_labels, dim)) * 0.07
    labels = rng.integers(0, k_labels, size=n)
    v = rng.standard_normal((n, dim)) + centroids[labels]
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row for row in v.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype("int32"), pa.int32()),
    })


def gen_events(n: int, n_users: int, rng: np.random.Generator):
    """The driver's events law at sf0.1: ts uniform over Jan 2024
    (30 days), user uniform over 15k users/sf1, 5 uniform event
    types, value ~ Exponential(mean 50)."""
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
    span = 30 * 86_400 * 1_000_000
    types = np.array(["click", "error", "purchase", "signup", "view"])
    ts = t0 + rng.integers(0, span, size=n)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, len(types), size=n)],
                               pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2),
                          pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=4242)
    args = ap.parse_args()

    n_docs = int(round(50_000 * args.sf))
    n_vecs = int(round(20_000 * args.sf))
    n_events = int(round(1_000_000 * args.sf))
    n_users = max(1, int(round(15_000 * args.sf)))
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    pq.write_table(gen_documents(n_docs, rng),
                   os.path.join(args.out_dir, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs, rng),
                   os.path.join(args.out_dir, "embeddings.parquet"))
    ev_path = os.path.join(args.out_dir, "events.parquet")
    if os.path.islink(ev_path):
        os.unlink(ev_path)  # upgrade dirs that predate event scaling
    pq.write_table(gen_events(n_events, n_users, rng), ev_path)

    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        dst = os.path.join(args.out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{name}.parquet"), dst)

    print(f"wrote {n_docs} documents + {n_vecs} embeddings to "
          f"{args.out_dir} (seed {args.seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
