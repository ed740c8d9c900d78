"""Generate CONSTANT-DUP-FRACTION corpora for the honest SRP 10x probe.

The r9 10x closure (BENCH_SCALE_r09) ran on ten VERBATIM clones — data
the r9 dedup-before-ANN path collapses to the distinct-vector set, so
the probe's own scale-up was deleted before banding (VERDICT r9,
What's-wrong #1). This generator builds the shape the ~n^1.15
candidate-growth claim is actually about: at BOTH scales, ~20% of docs
are SALTED near-duplicates (cosine >= ~0.97 to their source on the
hashed-shingle features, but NOT identical — one globally-unique junk
token appended), and the other ~80% are mutually-distinct docs
(per-clone vocab tags, the make_vocab_scale_data.py trick). Neither
the grouped dedup path (no identical vectors) nor banding (real
near-dup candidate pairs at a fixed fraction) gets a free collapse.

Layout per scale K in {1, 10}:
  unique docs: K*4000 — clone tags w0..w7 over the sf0.1 corpus
    (w0 = verbatim; every non-space token of clone i>0 suffixed 'w<i>',
    so clones share no shingles beyond 64-dim hash collisions)
  near-dups:  K*1000 — copies of the first K*1000 unique docs having
    >= 20 tokens, each with ' q<new_doc_id>x' appended (>= 18 shingles
    unchanged, 1 new -> cosine >= sqrt(18/19) ~ 0.973, never 1.0)

Writes /tmp/scaleprobe/dupfrac{1x,10x}/{documents,...}.parquet
(non-document tables copied from sf0.1 — the SRP gates read documents
only).

Usage: python tools/make_dupfrac_scale_data.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/scaleprobe"
N_SRC = 5000  # docs in the sf0.1 corpus


def build(con: duckdb.DuckDBPyConnection, k: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    dst = f"{out}/documents.parquet"
    if os.path.exists(dst):
        print(f"exists: {dst}")
        return
    n_uniq, n_dup = k * 4000, k * 1000
    n_tags = -(-n_uniq // N_SRC)  # clone tags needed to cover n_uniq
    selects = []
    for i in range(n_tags):
        text = (
            "text"
            if i == 0
            else rf"regexp_replace(text, '(\S+)', '\1w{i}', 'g')"
        )
        selects.append(
            f"SELECT row_number() OVER (ORDER BY doc_id) - 1 + {i * N_SRC} "
            f"AS doc_id, {text} AS text, lang, source, n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')"
        )
    con.execute(
        f"CREATE OR REPLACE TEMP VIEW uniq_pool AS "
        f"SELECT * FROM ({' UNION ALL '.join(selects)}) WHERE doc_id < {n_uniq}"
    )
    # near-dups: first n_dup unique docs with >= 20 tokens, one unique
    # junk token appended (ids continue after the unique block)
    con.execute(
        f"""
CREATE OR REPLACE TEMP VIEW dup_pool AS
WITH eligible AS (
  SELECT *, row_number() OVER (ORDER BY doc_id) - 1 AS rn
  FROM uniq_pool
  WHERE len(string_split_regex(trim(text), '\\s+')) >= 20
)
SELECT rn + {n_uniq} AS doc_id,
       text || ' q' || (rn + {n_uniq}) || 'x' AS text,
       lang, source, n_chars
FROM eligible WHERE rn < {n_dup}
"""
    )
    con.execute(
        f"COPY (SELECT * FROM uniq_pool UNION ALL SELECT * FROM dup_pool) "
        f"TO '{dst}' (FORMAT PARQUET)"
    )
    n, dups = con.execute(
        f"SELECT count(*), sum(CASE WHEN doc_id >= {n_uniq} THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{dst}')"
    ).fetchone()
    print(f"wrote {dst}: {n} docs ({dups} near-dups, {dups / n:.1%})")


def main() -> None:
    con = duckdb.connect()
    build(con, 1, f"{BASE}/dupfrac1x")
    build(con, 10, f"{BASE}/dupfrac10x")


if __name__ == "__main__":
    main()
