"""Generate a 10x corpus whose SHINGLE VOCABULARY also grows ~10x.

The standard clone corpus (tools/make_scale_data.py) replicates
documents verbatim, so a 10x row count carries ZERO new vocabulary —
which means the vocab-grain shuffle of sketch/dictionary queries
(`kmv_distinct_union_calibration`, `vocab_zipf_top20`) was never
stressed by the round-8 probe (VERDICT r8, Next #7). This variant
suffixes every token with a per-clone tag for clones 1..9 (clone 0
stays verbatim), so every word-3-gram shingle of a tagged clone is
distinct from every other clone's: distinct shingles grow ~10x while
row counts, token counts, and per-doc shapes stay identical to the
clone corpus.

Writes /tmp/scaleprobe/sf1.0vocab/{documents,...}.parquet (non-document
tables are copied from sf0.1 — the vocab probes only read documents).

Usage: python tools/make_vocab_scale_data.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/scaleprobe/sf1.0vocab"
K = 10


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    dst = f"{OUT}/documents.parquet"
    if os.path.exists(dst):
        print(f"exists: {dst}")
        return
    shift = (
        int(
            con.execute(
                f"SELECT max(doc_id) FROM read_parquet('{SRC}/documents.parquet')"
            ).fetchone()[0]
        )
        + 1
    )
    selects = []
    for i in range(K):
        if i == 0:
            text = "text"
        else:
            # suffix every non-space run: vocab of clone i is disjoint
            # from every other clone's (token counts unchanged)
            text = rf"regexp_replace(text, '(\S+)', '\1w{i}', 'g')"
        selects.append(
            f"SELECT doc_id + {i}*{shift} AS doc_id, {text} AS text, "
            f"lang, source, n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}' (FORMAT PARQUET)"
    )
    n, = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()
    print(f"wrote {dst}: {n} docs")


if __name__ == "__main__":
    main()
