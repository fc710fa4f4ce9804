"""Synthesize scaled-up copies of the driver testdata for the scale
rehearsal (SCALE_r04.md).

The driver's parquet at /root/testdata is read-only and capped at
sf0.1; to measure how the engine's plans SCALE (not just their
absolute speed) we need at least one 10x point.  This generator
derives the scaled tables from the sf0.1 marginals:

* ``documents``: 10x docs across 10x MORE SOURCES with per-source
  document count (and word-length / vocabulary marginals) held at
  the sf0.1 values.  ``source`` is the blocking key of every
  near-dup family, so this is the honest scale-up: per-block
  workload constant, block COUNT grows — the dimension a cluster
  scales out on.  Replicating texts verbatim would instead explode
  the true-near-dup density quadratically and measure a different
  (and unrealistic) workload.
* ``events``: 10x rows at the sf0.1 arrival RATE over a 10x time
  range, 10x users — the day-partitioned windows get 10x partitions
  of constant size.
* ``embeddings``: gaussian-mixture draws from the sf0.1 per-label
  moments, at 10x (20k) and at 131k (past the planes_for knee, so
  the ANN bucket-count adaptation is measurable).

Everything is seeded and derived from the public testdata marginals
only.  Output goes to /tmp (scratch), never to /root/testdata.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r04"
SEED = 20260814


def load(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def write(tbl: pa.Table, d: str, name: str) -> None:
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def link_static(d: str) -> None:
    """Symlink the tables we do not scale (TPC-H star) so any query
    can still resolve them in the scaled directory."""
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        dst = os.path.join(d, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)


def make_documents(rng: np.random.Generator, factor: int) -> pa.Table:
    docs = load("documents")
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = sorted(set(docs.column("source").to_pylist()))
    n_src = len(sources)

    words = [t.split(" ") for t in texts]
    lengths = np.array([len(w) for w in words])
    vocab, counts = np.unique(
        np.concatenate([np.array(w) for w in words]), return_counts=True)
    p_word = counts / counts.sum()
    lang_vals, lang_counts = np.unique(np.array(langs), return_counts=True)
    p_lang = lang_counts / lang_counts.sum()

    n_docs = len(texts) * factor
    new_lengths = rng.choice(lengths, size=n_docs, replace=True)
    total_words = int(new_lengths.sum())
    flat = rng.choice(vocab, size=total_words, replace=True, p=p_word)
    offs = np.concatenate([[0], np.cumsum(new_lengths)])
    new_texts = [" ".join(flat[offs[i]:offs[i + 1]])
                 for i in range(n_docs)]
    new_langs = rng.choice(lang_vals, size=n_docs, replace=True, p=p_lang)
    # factor x more sources, same expected docs-per-source as sf0.1
    new_sources = [f"src{int(x)}" for x in
                   rng.integers(0, n_src * factor, size=n_docs)]
    return pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(new_texts, type=pa.string()),
        "lang": pa.array(new_langs.tolist(), type=pa.string()),
        "source": pa.array(new_sources, type=pa.string()),
        "n_chars": pa.array([len(t) for t in new_texts], type=pa.int64()),
    })


def make_events(rng: np.random.Generator, factor: int) -> pa.Table:
    ev = load("events")
    n = ev.num_rows * factor
    ts = ev.column("ts").to_numpy()
    t0 = ts.min()
    span_us = (ts.max() - t0) / np.timedelta64(1, "us")
    # same arrival rate over a factor-x range: exponential gaps with
    # the sf0.1 mean inter-arrival
    mean_gap = span_us / ev.num_rows
    gaps = rng.exponential(mean_gap, size=n)
    new_ts = t0 + np.cumsum(gaps).astype("timedelta64[us]")
    types, tcounts = np.unique(
        np.array(ev.column("event_type").to_pylist()), return_counts=True)
    vals = ev.column("value").to_numpy()
    n_users = len(np.unique(ev.column("user_id").to_numpy())) * factor
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(new_ts),
        "user_id": pa.array(
            rng.integers(0, n_users, size=n), type=pa.int64()),
        "event_type": pa.array(
            rng.choice(types, size=n, p=tcounts / tcounts.sum()).tolist()),
        "value": pa.array(
            np.round(rng.choice(vals, size=n, replace=True)
                     + rng.normal(0, 0.01, size=n), 2),
            type=pa.float64()),
        "props": pa.array(
            [json.dumps({"k": int(k)})
             for k in rng.integers(0, 100, size=n)]),
    })


def make_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    emb = load("embeddings")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(emb.column("label").to_pylist())
    lab_vals, lab_counts = np.unique(labels, return_counts=True)
    mus = {v: vecs[labels == v].mean(axis=0) for v in lab_vals}
    sds = {v: vecs[labels == v].std(axis=0) for v in lab_vals}
    new_labels = rng.choice(lab_vals, size=n,
                            p=lab_counts / lab_counts.sum())
    out = np.empty((n, vecs.shape[1]), dtype=np.float32)
    for v in lab_vals:
        m = new_labels == v
        out[m] = (mus[v] + rng.standard_normal((int(m.sum()),
                                                vecs.shape[1])) * sds[v]
                  ).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(out.tolist(),
                              type=pa.list_(pa.float32())),
        "label": pa.array(new_labels.tolist(), type=pa.int32()),
    })


def main() -> None:
    rng = np.random.default_rng(SEED)
    if "x100" in sys.argv:
        # round-6 (verdict #9): a 100x documents corpus (500k docs,
        # 2000 sources) extending the count-join linearity evidence
        # past x30; documents only — the other tables symlink sf0.1
        d100 = os.path.join(OUT, "x100")
        rng100 = np.random.default_rng(SEED + 100)
        print("documents x100 ...", flush=True)
        write(make_documents(rng100, 100), d100, "documents")
        for name in ("events", "embeddings"):
            dst = os.path.join(d100, f"{name}.parquet")
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
        link_static(d100)
        print("done:", d100)
        return
    d10 = os.path.join(OUT, "x10")
    print("documents x10 ...", flush=True)
    write(make_documents(rng, 10), d10, "documents")
    print("events x10 ...", flush=True)
    write(make_events(rng, 10), d10, "events")
    print("embeddings x10 (20k) ...", flush=True)
    write(make_embeddings(rng, 20_000), d10, "embeddings")
    link_static(d10)
    # ANN-only corpus past the planes_for knee (9 planes at 131072)
    dann = os.path.join(OUT, "ann131k")
    print("embeddings 131k ...", flush=True)
    write(make_embeddings(rng, 131_072), dann, "embeddings")
    link_static(dann)
    # round-5: a 30x documents corpus (150k docs, 600 sources) — the
    # second scale point for the steepest curves (ngram jaccard,
    # TF-IDF pairs), and past SIG_KNEE so the corpus-adaptive MinHash
    # signature (minhash_params) is exercised end-to-end.
    d30 = os.path.join(OUT, "x30")
    print("documents x30 ...", flush=True)
    write(make_documents(rng, 30), d30, "documents")
    for name in ("events", "embeddings"):
        dst = os.path.join(d30, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    link_static(d30)
    print("done:", OUT)


if __name__ == "__main__":
    main()
