"""Build an Nx gate corpus from sf0.1 for scale-stress runs of the oracle
gate (VERDICT r3 item #7: "run the gate once at sf1 and record which caps
bind"; extended for 100x in round 4).

Construction (deterministic, oracle-safe by design — both engines read the
same parquet, so only the SCALE changes, never the planted semantics):

* documents: N shards; shard k shifts doc_id by k*5100 (a multiple of 300,
  so every %100 / %10 / %3 plant rule the queries rely on is preserved) and
  transforms the text per --mode:
  - prefix (default, the original 10x construction): prepend 15 (doc_id,
    k)-specific junk tokens, pushing cross-shard shingle Jaccard of the
    same base document well below the 0.8 threshold. Base-body shingles
    stay SHARED across shards, so shingle document-frequency grows N-fold —
    this models scale-up-by-duplication and makes every exact-join oracle's
    posting lists N long (DuckDB twin cost grows ~N^2). Good to 10x.
  - rename: suffix EVERY token with a shard tag containing a digit (the
    base corpus is lowercase a-y only, so no collision with shard 0 is
    possible). Token renaming is a bijection, so every within-shard
    shingle-set relation (Jaccard, containment, repeated grams) is EXACTLY
    sf0.1's, while cross-shard shingle sets are DISJOINT — shingle df
    distribution is preserved and both engines' join cost grows ~linearly
    in N. This models scale-up-with-fresh-content and is the mode that
    makes a 100x DuckDB gate tractable. (Hash-derived features — SimHash,
    MinHash signatures — change with the tokens; that is fine for the
    gate, which checks cross-engine parity on the same bytes, not planted
    recall.)
* embeddings: N shards; shard k shifts vec_id by k*2000 and applies a
  per-shard sign-flip pattern per dimension — an ISOMETRY, so within-shard
  cosine geometry is exactly sf0.1's, while cross-shard copies are
  ~orthogonal (random signs). Queries stay vec_id < 20: 20 probes against
  an Nx corpus.
* all other tables: copied verbatim (the relational queries re-run at sf0.1
  size; the dedup/ANN tiers are where scale binds caps).

Usage: python tools/make_sf10x.py [src_dir] [out_dir] [shards] [mode]
  mode: prefix (default) | rename
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_SHIFT = 5100   # > max sf0.1 doc_id (4999) and % 300 == 0
EMB_SHIFT = 2000   # sf0.1 embedding count
SHARDS = 10
PREFIX_TOKENS = 15


def scale_documents(src: Path, out: Path, shards: int, mode: str) -> None:
    t = pq.read_table(src / "documents.parquet")
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for k in range(shards):
        for i, d in enumerate(doc_id):
            nd = int(d) + k * DOC_SHIFT
            if k == 0:
                nt = text[i]
            elif mode == "rename":
                tag = f"0{k}"   # digits never occur in the base corpus
                nt = " ".join(w + tag for w in text[i].split())
            else:
                pre = " ".join(
                    f"z{(int(d) * 31 + k * 7 + j * 13) % 9973}x{k}"
                    for j in range(PREFIX_TOKENS))
                nt = pre + " " + text[i]
            ids.append(nd)
            texts.append(nt)
            langs.append(lang[i])
            sources.append(source[i])
            nchars.append(len(nt))
    # Small row groups matter at 100x: pyarrow's default writes the whole
    # table as ONE row group, and a parquet file with one row group is
    # unsplittable for Spark no matter how many byte-range splits the scan
    # plans — every downstream stage serializes onto the single task that
    # holds the row-group start. 20k-row groups keep the scan parallel.
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(nchars, pa.int64()),
    }), out / "documents.parquet", row_group_size=20_000)


def scale_embeddings(src: Path, out: Path, shards: int) -> None:
    t = pq.read_table(src / "embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label").to_numpy()
    dim = emb.shape[1]
    rng = np.random.Generator(np.random.PCG64(123))
    ids, vecs, labels = [], [], []
    for k in range(shards):
        signs = (np.where(rng.random(dim) < 0.5, -1.0, 1.0).astype(np.float32)
                 if k else np.ones(dim, dtype=np.float32))
        ids.append(vec_id + k * EMB_SHIFT)
        vecs.append(emb * signs[None, :])
        labels.append(label)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(ids), pa.int64()),
        "embedding": pa.array([v.tolist() for v in np.concatenate(vecs)],
                              pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(labels).astype(np.int32), pa.int32()),
    }), out / "embeddings.parquet", row_group_size=20_000)


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x")
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else SHARDS
    mode = sys.argv[4] if len(sys.argv) > 4 else "prefix"
    if mode not in ("prefix", "rename"):
        raise SystemExit(f"unknown mode {mode!r} (prefix|rename)")
    out.mkdir(parents=True, exist_ok=True)
    scale_documents(src, out, shards, mode)
    scale_embeddings(src, out, shards)
    for f in src.glob("*.parquet"):
        if f.name not in ("documents.parquet", "embeddings.parquet"):
            shutil.copy(f, out / f.name)
    print(f"wrote {out}: documents x{shards} ({mode}), embeddings x{shards}, "
          f"rest copied from {src}")


if __name__ == "__main__":
    main()
