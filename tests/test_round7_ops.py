"""Round-7 operator derivation tests: each new query's MECHANISM is
re-derived in pure python (hashlib md5, dict folds) independently of
both engines — the DuckDB oracle proves Spark↔DuckDB agreement, these
prove both match the published algorithm.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from bigdata_carprice_assignment_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    """portable_hash60: first 15 md5 hex chars of the utf-8 bytes."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _duck(sql: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def _hll_python(keys: list[str]) -> tuple[float, int]:
    """Flajolet et al. 2007 with p=8 over the 60-bit portable hash."""
    regs: dict[int, int] = {}
    mask = (1 << 52) - 1
    for k in keys:
        h = _h60("hll:" + k)
        b, rem = h >> 52, h & mask
        rho = 53 if rem == 0 else 53 - rem.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (53 - m) for m in regs.values()) + (256 - len(regs)) * (1 << 53)
    v = 256 - len(regs)
    raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * float(1 << 53) / float(s)
    est = 256.0 * math.log(256.0 / v) if (raw <= 640.0 and v > 0) else raw
    return round(est, 4), len(regs)


@pytest.mark.parametrize("col,label", [
    ("o_orderkey", "orderkey"),
    ("o_custkey", "custkey"),
    ("o_orderpriority", "orderpriority"),
])
def test_hll_matches_python(spark, col, label):
    keys = [str(r[0]) for r in _duck(f"SELECT {col} FROM orders")]
    want_est, want_regs = _hll_python(keys)
    rows = registry.QUERIES["hll_distinct_calibration"](spark, SF).collect()
    got = {r["key"]: r for r in rows}[label]
    assert got["hll_estimate"] == pytest.approx(want_est, abs=1e-9)
    assert got["registers_hit"] == want_regs
    assert got["exact_distinct"] == len(set(keys))


def test_countmin_matches_python(spark):
    """Cormode–Muthukrishnan 2005: cells are exact integer counts; the
    min-over-d-cells estimate never underestimates."""
    keys = [str(r[0]) for r in _duck("SELECT l_partkey FROM lineitem")]
    cells: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(4):
            b = _h60(f"cm{r}:{k}") & 255
            cells[(r, b)] = cells.get((r, b), 0) + 1
    freq: dict[str, int] = {}
    for k in keys:
        freq[k] = freq.get(k, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], int(kv[0])))[:10]
    rows = registry.QUERIES["countmin_heavy_hitters_check"](spark, SF).collect()
    got = {r["l_partkey"]: r for r in rows}
    assert len(got) == len(top)
    for k, exact in top:
        est = min(cells[(r, _h60(f"cm{r}:{k}") & 255)] for r in range(4))
        row = got[int(k)]
        assert row["exact_count"] == exact
        assert row["cm_estimate"] == est
        assert row["overestimate"] == est - exact >= 0


def test_bloom_matches_python(spark):
    build = {
        r[0]
        for r in _duck(
            "SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        )
    }
    probe = {r[0] for r in _duck("SELECT DISTINCT o_custkey FROM orders")}
    bits = {_h60(f"bf{j}:{k}") % 4096 for k in build for j in range(3)}
    passed = {
        k for k in probe if all(_h60(f"bf{j}:{k}") % 4096 in bits for j in range(3))
    }
    row = registry.QUERIES["bloom_join_pruning_audit"](spark, SF).collect()[0]
    assert row["n_build_keys"] == len(build)
    assert row["n_bits_set"] == len(bits)
    assert row["n_probe_keys"] == len(probe)
    assert row["n_bloom_pass"] == len(passed)
    assert row["n_true_members"] == len(probe & build)
    # zero false negatives by construction
    assert (probe & build) <= passed
    assert row["n_false_positives"] == len(passed - build)


def test_funnel_matches_python(spark):
    rows = _duck("SELECT user_id, event_type, ts FROM events")
    by_user: dict = {}
    for uid, et, ts in rows:
        by_user.setdefault(uid, []).append((et, ts))
    day = 24 * 3600
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        views = [ts for et, ts in evs if et == "view"]
        if not views:
            continue
        n1 += 1
        t1 = min(views)
        clicks = [
            ts for et, ts in evs
            if et == "click" and ts > t1 and (ts - t1).total_seconds() <= day
        ]
        if not clicks:
            continue
        n2 += 1
        t2 = min(clicks)
        buys = [
            ts for et, ts in evs
            if et == "purchase" and ts > t2 and (ts - t2).total_seconds() <= day
        ]
        if buys:
            n3 += 1
    row = registry.QUERIES["event_funnel_conversion"](spark, SF).collect()[0]
    assert (row["n_viewed"], row["n_clicked_after"], row["n_purchased_after"]) == (
        n1, n2, n3,
    )
    assert row["view_to_click"] == pytest.approx(round(n2 / n1, 6))


def test_unonehot_recovers_brands(spark):
    """F9 round trip: reversing the one-hot matrix recovers the original
    brand counts, with the dropped first level mapped to 'Unknown'."""
    from bigdata_carprice_assignment_spark.pipelines import carprice as cp
    from bigdata_carprice_assignment_spark.queries.carprice import _cleaned

    cleaned = _cleaned(spark)
    orig = {
        (r["brand"] if r["brand"] != "alfa-romero" else "Unknown"): r["n"]
        for r in cleaned.groupBy("brand").count().withColumnRenamed("count", "n").collect()
    }
    # merge counts that collapse to the same recovered label
    want: dict[str, int] = {}
    for k, n in orig.items():
        want[k] = want.get(k, 0) + n
    rows = registry.QUERIES["carprice_un_onehot_replay"](spark, SF).collect()
    got = {r["brand_recovered"]: r["n_cars"] for r in rows}
    assert got == want


def test_srp_adaptive_bands_hold_recall_contract():
    """Band count must GROW with band bits (fixed bands shed recall
    exponentially as bits grow — the sf0.1 sweep leak), and the implied
    per-pair miss at the design cosine stays at or under the target."""
    import math as m

    from bigdata_carprice_assignment_spark.llm import similarity as S

    theta = m.acos(0.94)
    prev = 0
    for bits in (10, 13, 16, 20):
        bands = S.srp_adaptive_bands(bits)
        assert bands > prev
        prev = bands
        p1 = (1.0 - theta / m.pi) ** bits
        assert (1.0 - p1) ** bands <= 1e-4 * (1 + 1e-9)
