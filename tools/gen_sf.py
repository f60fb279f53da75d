#!/usr/bin/env python3
"""Generate a larger scale factor locally by extrapolating /root/testdata/sf0.1.

Usage: python tools/gen_sf.py [dst_dir] [K]

Produces dst_dir (default /root/repo/.sfdata/sf1) holding the same ten
tables at K× (default 10×) the sf0.1 volume, plus sibling symlinks
sf0.001/sf0.01/sf0.1 back to /root/testdata so `bench.py --sweep` can
treat the parent as a uniform SF base. The driver's testdata is
read-only and its generator is not published, so sf1 is derived from
the sf0.1 tables themselves:

- region/nation: copied (fixed dimensions — they do not scale with SF).
- customer/supplier/part/orders/lineitem/events: tiled K times with a
  per-key stride (stride = max(key)+1 of the source), so referential
  integrity, join fan-in per key, group cardinalities per key, and
  value distributions are all preserved exactly; only the number of
  distinct keys grows K×, which is precisely how TPC-H itself scales.
- documents/embeddings: synthesized fresh rather than tiled — tiling
  text K× would give every doc K-1 identical siblings and explode
  near-dup candidate counts quadratically, which no real corpus does.
  Texts are sampled from the source's per-language word distributions
  with the source's doc-length mix, then exact dups (~0.2%) and
  near-dups (~4%, 10% of words perturbed) are planted at the source's
  measured densities. Embeddings are per-label Gaussians fitted to the
  source, re-normalized to unit length (matching the source's norms).

Deterministic: numpy seed 42. Large fact tables are written as one
file per tile so a local[32] scan gets natural split parallelism,
matching the many-file layout any 100 TB table would have.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def tile_table(name: str, strides: dict[str, int], k: int, dst: str, multi: bool) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    out_dir = os.path.join(dst, f"{name}.parquet")
    tiles = []
    for i in range(k):
        cols = [
            pc.add(t[c], i * strides[c]).cast(t.schema.field(c).type)
            if c in strides and i > 0
            else t[c]
            for c in t.column_names
        ]
        tile = pa.Table.from_arrays(cols, names=t.column_names)
        if multi:
            os.makedirs(out_dir, exist_ok=True)
            pq.write_table(tile, os.path.join(out_dir, f"part-{i:05d}.parquet"))
        else:
            tiles.append(tile)
    if not multi:
        pq.write_table(pa.concat_tables(tiles), out_dir)


def copy_table(name: str, dst: str) -> None:
    pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), os.path.join(dst, f"{name}.parquet"))


def gen_documents(k: int, dst: str, rng: np.random.Generator) -> None:
    src = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
    n_out = len(src["doc_id"]) * k
    by_lang: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for lang in set(src["lang"]):
        words: dict[str, int] = {}
        for t, lg in zip(src["text"], src["lang"]):
            if lg == lang:
                for w in t.split():
                    words[w] = words.get(w, 0) + 1
        vocab = np.array(list(words))
        freq = np.array(list(words.values()), dtype=float)
        by_lang[lang] = (vocab, freq / freq.sum())
    lang_source = list(zip(src["lang"], src["source"]))
    lengths = np.array([len(t.split()) for t in src["text"]])

    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    pair_idx = rng.integers(0, len(lang_source), n_out)
    len_idx = rng.integers(0, len(lengths), n_out)
    kind = rng.random(n_out)
    for i in range(n_out):
        lang, source = lang_source[pair_idx[i]]
        if i > 100 and kind[i] < 0.002:  # exact dup
            j = int(rng.integers(0, i))
            texts.append(texts[j]); langs.append(langs[j]); sources.append(source)
            continue
        vocab, p = by_lang[lang]
        if i > 100 and kind[i] < 0.042:  # near dup: perturb 10% of an earlier doc
            j = int(rng.integers(0, i))
            w = texts[j].split()
            n_swap = max(1, len(w) // 10)
            pos = rng.integers(0, len(w), n_swap)
            repl = rng.choice(len(vocab), n_swap, p=p)
            for a, b in zip(pos, repl):
                w[int(a)] = str(vocab[int(b)])
            lang = langs[j]
        else:
            w = [str(vocab[int(x)]) for x in rng.choice(len(vocab), int(lengths[len_idx[i]]), p=p)]
        texts.append(" ".join(w) + " ")
        langs.append(lang); sources.append(source)
    out = pa.table(
        {
            "doc_id": pa.array(range(n_out), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(out, os.path.join(dst, "documents.parquet"))


def gen_embeddings(k: int, dst: str, rng: np.random.Generator) -> None:
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    E = np.array(src["embedding"].to_pylist(), dtype=np.float32)
    labels = src["label"].to_numpy()
    n_out = len(labels) * k
    uniq, counts = np.unique(labels, return_counts=True)
    means = {lb: E[labels == lb].mean(axis=0) for lb in uniq}
    stds = {lb: E[labels == lb].std(axis=0) for lb in uniq}
    out_labels = rng.choice(uniq, n_out, p=counts / counts.sum())
    vecs = np.empty((n_out, E.shape[1]), dtype=np.float32)
    for lb in uniq:
        m = out_labels == lb
        vecs[m] = means[lb] + rng.standard_normal((m.sum(), E.shape[1])) * stds[lb]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    out = pa.table(
        {
            "vec_id": pa.array(range(n_out), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(out_labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"))


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sfdata/sf1"
    if dst.startswith("-"):
        # a flag-looking dst has twice created a 164 MB "--help" dir
        sys.exit(f"usage: gen_sf.py [dst_dir] [k]   (got dst={dst!r})")
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(42)

    def stride(table: str, col: str) -> int:
        return int(pc.max(pq.read_table(f"{SRC}/{table}.parquet", columns=[col])[col]).as_py()) + 1

    cust = stride("customer", "c_custkey")
    supp = stride("supplier", "s_suppkey")
    part = stride("part", "p_partkey")
    okey = stride("orders", "o_orderkey")
    evid = stride("events", "event_id")
    user = stride("events", "user_id")

    copy_table("region", dst)
    copy_table("nation", dst)
    tile_table("customer", {"c_custkey": cust}, k, dst, multi=False)
    tile_table("supplier", {"s_suppkey": supp}, k, dst, multi=False)
    tile_table("part", {"p_partkey": part}, k, dst, multi=False)
    tile_table("orders", {"o_orderkey": okey, "o_custkey": cust}, k, dst, multi=True)
    tile_table(
        "lineitem",
        {"l_orderkey": okey, "l_partkey": part, "l_suppkey": supp},
        k, dst, multi=True,
    )
    tile_table("events", {"event_id": evid, "user_id": user}, k, dst, multi=True)
    gen_documents(k, dst, rng)
    gen_embeddings(k, dst, rng)

    # sibling symlinks so SPARK_GRAFT_SF_BASE=<parent> serves every SF
    base = os.path.dirname(dst)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        link = os.path.join(base, sf)
        if not os.path.exists(link):
            os.symlink(f"/root/testdata/{sf}", link)
    for name in sorted(os.listdir(dst)):
        p = os.path.join(dst, name)
        files = [os.path.join(p, f) for f in os.listdir(p)] if os.path.isdir(p) else [p]
        rows = sum(pq.read_metadata(f).num_rows for f in files if f.endswith(".parquet"))
        print(f"{name}: rows={rows} files={len(files)}")


if __name__ == "__main__":
    main()
