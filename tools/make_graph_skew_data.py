"""Generate 10x-edge co-purchase graphs — uniform vs power-law degree —
for the round-10 graph skew probe (VERDICT r9 ask #7).

The graph family's 10x probes (BENCH_SCALE_r08: PageRank 1.74x,
triangles 1.54x) ran on clone corpora whose degree distribution stays
uniform-ish; the adversarial shape for the per-round contribution
groupBy and the wedge self-join is POWER-LAW degree with one celebrity
vertex owning ~30% of edges. Both corpora here carry the SAME edge
count (10x the sf0.1 co-purchase graph's 212,406 edges), differing
only in degree shape, so skew/uniform timing ratios isolate the skew
effect — the BENCH_SCALE_r09c methodology applied to graphs.

Each edge is encoded as one synthetic order holding exactly its two
endpoint parts at l_quantity=30, so the queries' own co-purchase
derivation (filter -> distinct -> per-order self-join) reproduces the
designed edge list exactly. Non-lineitem tables are copied from sf0.1
(the two graph queries read lineitem only; the rest keeps load_table
happy for any incidental scan).

Writes /tmp/scaleprobe/graph{uni,zipf}10x/*.parquet.

Usage: python tools/make_graph_skew_data.py
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/scaleprobe"
E_TARGET = 2_124_060  # 10x the sf0.1 co-purchase edge count
# Node space sized so a 30%-of-edges celebrity can have that many
# DISTINCT neighbors (0.3 * E < N). BOTH corpora use the same space so
# degree shape is the only variable between them (the uniform baseline
# is then sparser than the natural 10x clone graph — the probe's
# readout is the zipf/uniform RATIO at fixed |V| and |E|, not absolute
# seconds).
N_NODES = 2_200_000
SEED = 20260816


def _copy_side_tables(con, out: str) -> None:
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "events", "documents", "embeddings",
    ]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )


def _dedup_edges(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    keep = lo != hi
    packed = lo[keep].astype(np.int64) * N_NODES + hi[keep]
    return np.unique(packed)


def uniform_edges(rng: np.random.Generator) -> np.ndarray:
    packed = np.empty(0, dtype=np.int64)
    while packed.size < E_TARGET:
        need = int((E_TARGET - packed.size) * 1.2) + 1000
        u = rng.integers(0, N_NODES, size=need)
        v = rng.integers(0, N_NODES, size=need)
        packed = np.unique(np.concatenate([packed, _dedup_edges(u, v)]))
    return packed[:E_TARGET]


def zipf_edges(rng: np.random.Generator) -> np.ndarray:
    """Celebrity node 0 owns ~30% of edges (distinct neighbors sampled
    without replacement); the rest of the graph draws endpoints from a
    zipf(a=2)-weighted node distribution, so the degree tail is
    power-law rather than binomial."""
    n_celeb = int(E_TARGET * 0.3)
    neigh = rng.choice(np.arange(1, N_NODES), size=n_celeb, replace=False)
    celeb = neigh.astype(np.int64)  # packed as 0 * N_NODES + neighbor
    # harmonic (zipf a=1) endpoint weights: heavy-tailed degrees without
    # the a=2 degeneracy where ~60% of draws hit rank 1 and the DISTINCT
    # pair space needed for E edges is unreachable (top background hub
    # still lands ~7% of endpoint draws -> in-degree ~10^5)
    w = 1.0 / np.arange(1, N_NODES + 1, dtype=np.float64)
    w /= w.sum()
    perm = rng.permutation(N_NODES)  # rank-to-node: hubs scattered in id space
    packed = np.empty(0, dtype=np.int64)
    target_rest = E_TARGET - n_celeb
    while packed.size < target_rest:
        need = int((target_rest - packed.size) * 1.5) + 1000
        u = perm[rng.choice(N_NODES, size=need, p=w)]
        v = perm[rng.choice(N_NODES, size=need, p=w)]
        cand = _dedup_edges(u, v)
        cand = cand[cand >= N_NODES]  # node 0's edges come from `celeb` only
        packed = np.unique(np.concatenate([packed, cand]))
        print(f"zipf background: {packed.size}/{target_rest}", flush=True)
    return np.concatenate([celeb, packed[:target_rest]])


def write_lineitem(packed: np.ndarray, out: str) -> None:
    e = packed.size
    u = (packed // N_NODES).astype(np.int64)
    v = (packed % N_NODES).astype(np.int64)
    orderkey = np.repeat(np.arange(e, dtype=np.int64), 2)
    partkey = np.empty(2 * e, dtype=np.int64)
    partkey[0::2], partkey[1::2] = u, v
    n = 2 * e
    table = pa.table(
        {
            "l_orderkey": orderkey,
            "l_partkey": partkey,
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_linenumber": pa.array(
                np.tile(np.array([1, 2], dtype=np.int32), e), type=pa.int32()
            ),
            "l_quantity": np.full(n, 30.0),
            "l_extendedprice": np.full(n, 100.0),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array(
                np.full(n, np.datetime64("2024-01-01T00:00:00", "us"))
            ),
        }
    )
    pq.write_table(table, f"{out}/lineitem.parquet")


def main() -> None:
    con = duckdb.connect()
    rng = np.random.default_rng(SEED)
    for name, gen in [("graphuni10x", uniform_edges), ("graphzipf10x", zipf_edges)]:
        out = f"{BASE}/{name}"
        os.makedirs(out, exist_ok=True)
        _copy_side_tables(con, out)
        dst = f"{out}/lineitem.parquet"
        if os.path.exists(dst):
            print(f"exists: {dst}")
            continue
        packed = gen(rng)
        write_lineitem(packed, out)
        u = packed // N_NODES
        deg0 = int((u == 0).sum() + ((packed % N_NODES) == 0).sum())
        print(
            f"wrote {dst}: {packed.size} edges, celebrity degree {deg0}"
            f" ({deg0 / packed.size:.1%})"
        )


if __name__ == "__main__":
    main()
