"""Algorithm-correctness tests for the round-6 additions — independent
numpy/pure-python re-derivations so the cross-engine oracle sweep and the
is-the-algebra-right check fail independently."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from bigdata_carprice_assignment_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _copurchase_edges(spark, sf=SF):
    from pyspark.sql import functions as F

    from bigdata_carprice_assignment_spark.sources.readers import load_table

    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))
    return edges


def test_skyline_matches_bruteforce(spark):
    from bigdata_carprice_assignment_spark.sources.readers import load_table

    rows = load_table(spark, SF, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    pts = [(r["p_partkey"], r["p_retailprice"], r["p_size"]) for r in rows]

    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])
            for b in pts
        )

    want = sorted(k for (k, *_) in [p for p in pts if not dominated(p)])
    got = sorted(
        r["p_partkey"]
        for r in registry.QUERIES["part_skyline_pareto"](spark, SF).collect()
    )
    assert got == want
    # frontier sanity: non-empty, strictly smaller than the table, and
    # mutually non-dominating by construction
    assert 0 < len(got) < len(pts)


def test_skyline_handles_duplicates_and_ties(spark):
    # duplicate points are mutually non-dominating -> both survive;
    # a point tied on one axis but worse on the other is dominated
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 1.0, 6), (4, 2.0, 4), (5, 3.0, 4)],
        "id long, x double, y int",
    ).repartition(3)
    from bigdata_carprice_assignment_spark.operators.skyline import skyline_2d_min

    got = sorted(r["id"] for r in skyline_2d_min(df, "x", "y").collect())
    assert got == [1, 2, 4]


def test_bfs_hop_counts_matches_python_bfs(spark):
    edges = _copurchase_edges(spark)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seeds = {n for n in adj if n % 101 == 0}
    visited = set(seeds)
    frontier = set(seeds)
    want = [(0, len(frontier))]
    for h in range(1, 5):
        frontier = {o for n in frontier for o in adj[n]} - visited
        visited |= frontier
        want.append((h, len(frontier)))
    got = [
        (r["hop"], r["n_new"])
        for r in registry.QUERIES["copurchase_bfs_hop_histogram"](
            spark, SF
        ).collect()
    ]
    assert got == want
    assert want[0][1] > 0, "seed set empty — probe is vacuous"


def test_kcore_trace_matches_python_peel(spark):
    edges = _copurchase_edges(spark)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    want = [(0, len(alive), len(edges))]
    for r in range(1, 7):
        alive = {n for n in alive if len(adj[n] & alive) >= 3}
        e_alive = sum(1 for u, v in edges if u in alive and v in alive)
        want.append((r, len(alive), e_alive))
    got = [
        (r["round"], r["n_nodes"], r["n_edges"])
        for r in registry.QUERIES["copurchase_kcore_peel_trace"](
            spark, SF
        ).collect()
    ]
    assert got == want


def test_position_weighted_attribution_matches_python(spark):
    from bigdata_carprice_assignment_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events").collect()
    clicks = [
        (r["user_id"], r["ts"], r["event_id"])
        for r in ev
        if r["event_type"] == "click"
    ]
    purchases = [
        (r["user_id"], r["ts"], r["event_id"], r["value"] or 0.0)
        for r in ev
        if r["event_type"] == "purchase"
    ]
    credit = Counter()
    touches = Counter()
    for u, pts, pid, val in purchases:
        path = sorted(
            (cts, cid)
            for (cu, cts, cid) in clicks
            if cu == u and cts <= pts and (pts - cts).total_seconds() <= 3600
        )
        n = len(path)
        for i in range(n):
            if n == 1:
                pos, w = "only", 1.0
            elif i == 0:
                pos, w = "first", 0.5 if n == 2 else 0.4
            elif i == n - 1:
                pos, w = "last", 0.5 if n == 2 else 0.4
            else:
                pos, w = "middle", 0.2 / (n - 2)
            credit[pos] += w * val
            touches[pos] += 1
    got = {
        r["position"]: (r["n_touches"], r["credit_sum"])
        for r in registry.QUERIES["position_weighted_attribution"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(touches)
    for pos in touches:
        assert got[pos][0] == touches[pos]
        assert abs(got[pos][1] - credit[pos]) < 1e-6
    # per-purchase credit shares must each sum to 1, so total credit
    # equals total attributed purchase value
    n_attr_purch = sum(
        1
        for u, pts, pid, val in purchases
        if any(
            cu == u and cts <= pts and (pts - cts).total_seconds() <= 3600
            for (cu, cts, cid) in clicks
        )
    )
    assert n_attr_purch > 0


def test_knn_label_vote_matches_numpy(spark):
    from bigdata_carprice_assignment_spark.sources.readers import load_table

    rows = load_table(spark, SF, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    qm = (ids % 25 == 0) & (ids < 5000)
    Q, QL, QI = X[qm], labels[qm], ids[qm]
    R, RL, RI = X[~qm], labels[~qm], ids[~qm]
    Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Rn @ Qn.T  # refs x queries
    per_label = defaultdict(lambda: [0, 0])
    for j in range(Qn.shape[0]):
        order = sorted(range(len(RI)), key=lambda i: (-sims[i, j], RI[i]))[:3]
        votes = Counter(RL[i] for i in order)
        top = max(votes.values())
        voted = min(l for l, c in votes.items() if c == top)
        per_label[int(QL[j])][0] += 1
        per_label[int(QL[j])][1] += int(voted == QL[j])
    got = {
        r["label"]: (r["n_queries"], r["n_correct"], r["accuracy"])
        for r in registry.QUERIES["ann_knn_label_vote"](spark, SF).collect()
    }
    assert set(got) == set(per_label)
    for lab, (nq, nc) in per_label.items():
        assert got[lab][0] == nq
        assert got[lab][1] == nc
        assert abs(got[lab][2] - round(nc / nq, 4)) < 1e-9


def _norm_tokens(text):
    import re

    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9_\s]", " ", text.lower())).strip()
    return t.split(" ") if t else [""]


def test_dsir_importance_weights_matches_python(spark):
    import hashlib
    import math

    from bigdata_carprice_assignment_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    B = 256

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B

    ct, cr = Counter(), Counter()
    per_doc = {}
    for r in docs:
        toks = [t for t in _norm_tokens(r["text"]) if t != ""]
        bs = [bucket(t) for t in toks]
        per_doc[r["doc_id"]] = (r["source"], bs)
        for b in bs:
            cr[b] += 1
            if r["source"] == "src0":
                ct[b] += 1
    nt, nr = sum(ct.values()), sum(cr.values())
    lr = {
        b: math.log(((ct.get(b, 0) + 1) / (nt + B)) / ((cr[b] + 1) / (nr + B)))
        for b in cr
    }
    agg = defaultdict(lambda: [0, 0, 0.0, -1e18])
    for src, bs in per_doc.values():
        if not bs:
            continue
        w = sum(lr[b] for b in bs)
        a = agg[src]
        a[0] += 1
        a[1] += len(bs)
        a[2] += w
        a[3] = max(a[3], w)
    got = {
        r["source"]: r
        for r in registry.QUERIES["dsir_importance_weights"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for src, (nd, ntk, sw, mx) in agg.items():
        assert got[src]["n_docs"] == nd
        assert got[src]["n_tokens"] == ntk
        assert abs(got[src]["avg_log_weight"] - sw / nd) < 1e-5
        assert abs(got[src]["max_log_weight"] - mx) < 1e-5


def test_rrf_fusion_matches_python(spark):
    import math

    from bigdata_carprice_assignment_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    terms = ["vector", "join", "stream"]
    n_docs = len(docs)
    tf, dl = {}, {}
    for r in docs:
        toks = _norm_tokens(r["text"])
        dl[r["doc_id"]] = len(toks)
        c = Counter(t for t in toks if t in terms)
        if c:
            tf[r["doc_id"]] = c
    dfreq = {t: sum(1 for c in tf.values() if c[t] > 0) for t in terms}
    avgdl = sum(dl.values()) / n_docs
    k1, b = 1.2, 0.75

    def s_tfidf(d):
        return sum(
            tf[d][t] * math.log((1 + n_docs) / (1 + dfreq[t])) for t in terms
        )

    def s_bm25(d):
        return sum(
            math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            * (tf[d][t] * (k1 + 1))
            / (tf[d][t] + k1 * ((1 - b) + b * dl[d] / avgdl))
            for t in terms
        )

    def s_cnt(d):
        return sum(tf[d][t] for t in terms)

    fused = Counter()
    for scorer in (s_tfidf, s_bm25, s_cnt):
        order = sorted(tf, key=lambda d: (-scorer(d), d))[:20]
        for rank, d in enumerate(order, 1):
            fused[d] += 1.0 / (60 + rank)
    want = sorted(fused, key=lambda d: (-fused[d], d))[:10]
    got = registry.QUERIES["rrf_fused_retrieval_top10"](spark, SF).collect()
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert abs(r["rrf_score"] - round(fused[r["doc_id"]], 6)) < 1e-9


def test_clustering_coeff_matches_python(spark):
    edges = _copurchase_edges(spark)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    agg = defaultdict(lambda: [0, 0.0])
    for n, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        nbl = sorted(nb)
        tri = sum(
            1
            for i in range(d)
            for j in range(i + 1, d)
            if nbl[j] in adj[nbl[i]]
        )
        c = tri / (d * (d - 1) / 2)
        if c == 0:
            bin_ = "0"
        elif c < 0.25:
            bin_ = "(0,0.25)"
        elif c < 0.5:
            bin_ = "[0.25,0.5)"
        elif c < 0.75:
            bin_ = "[0.5,0.75)"
        elif c < 1.0:
            bin_ = "[0.75,1)"
        else:
            bin_ = "1"
        agg[bin_][0] += 1
        agg[bin_][1] += c
    got = {
        r["bin"]: r
        for r in registry.QUERIES["copurchase_clustering_coeff_hist"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(agg)
    for bin_, (n, sc) in agg.items():
        assert got[bin_]["n_nodes"] == n
        assert abs(got[bin_]["avg_coeff"] - sc / n) < 1e-5


def test_sliding_rollup_replay_matches_python(spark):
    from bigdata_carprice_assignment_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events").select("ts").collect()
    counts = Counter()
    for r in ev:
        epoch = int(r["ts"].timestamp() * 1_000_000)
        for j in range(4):
            counts[(epoch // 900_000_000 - j) * 900_000_000] += 1
    got = registry.QUERIES["streaming_sliding_rollup_replay"](spark, SF).collect()
    assert len(got) == len(counts)
    assert sum(r["n"] for r in got) == 4 * len(ev)


def test_body_profile_normalized_matches_numpy(spark):
    from bigdata_carprice_assignment_spark.queries.carprice import (
        _NUMERIC6,
        _cleaned,
    )

    rows = _cleaned(spark).select("carbody", *_NUMERIC6).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r["carbody"]].append([r[c] for c in _NUMERIC6])
    means = {g: np.mean(np.array(v), axis=0) for g, v in groups.items()}
    M = np.array([means[g] for g in sorted(means)])
    mn, mx = M.min(axis=0), M.max(axis=0)
    want = (M - mn) / np.maximum(mx - mn, 1e-12)
    got = registry.QUERIES["carprice_body_profile_normalized"](
        spark, SF
    ).collect()
    assert [r["carbody"] for r in got] == sorted(means)
    for i, r in enumerate(got):
        for j, c in enumerate(_NUMERIC6):
            assert abs(r[c] - want[i, j]) < 1e-5
    # normalization invariant: every column spans exactly [0, 1]
    arr = np.array([[r[c] for c in _NUMERIC6] for r in got])
    assert np.allclose(arr.min(axis=0), 0, atol=1e-6)
    assert np.allclose(arr.max(axis=0), 1, atol=1e-6)


def test_standardized_stats_matches_numpy(spark):
    from bigdata_carprice_assignment_spark.queries.carprice import (
        _NUMERIC6,
        _cleaned,
    )

    rows = _cleaned(spark).select(*_NUMERIC6).collect()
    X = np.array([[r[c] for c in _NUMERIC6] for r in rows], dtype=float)
    Z = (X - X.mean(axis=0)) / X.std(axis=0, ddof=1)
    got = {
        r["feature"]: r
        for r in registry.QUERIES["carprice_standardized_stats"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(_NUMERIC6)
    for j, c in enumerate(_NUMERIC6):
        assert abs(got[c]["min_scaled"] - Z[:, j].min()) < 1e-4
        assert abs(got[c]["max_scaled"] - Z[:, j].max()) < 1e-4
        assert abs(got[c]["mean_abs_scaled"] - np.abs(Z[:, j]).mean()) < 1e-4


def test_holt_winters_matches_python(spark):
    import math

    from .test_round5b_ops import _daily_cents

    rows = _daily_cents(spark)
    xs = [float(r["cents"]) for r in rows]
    m = 7
    l = sum(xs[:m]) / m
    b = (sum(xs[m : 2 * m]) / m - sum(xs[:m]) / m) / m
    seas = [x - l for x in xs[:m]]
    sse = 0.0
    for x in xs[m:]:
        fc = l + b + seas[0]
        sse += (x - fc) ** 2
        l_new = 0.3 * (x - seas[0]) + 0.7 * (l + b)
        b = 0.1 * (l_new - l) + 0.9 * b
        seas = seas[1:] + [0.2 * (x - l_new) + 0.8 * seas[0]]
        l = l_new
    got = registry.QUERIES["holt_winters_weekly_daily_revenue"](
        spark, SF
    ).collect()[0]
    assert got["n_days"] == len(xs)
    assert abs(got["level"] - l / 100) < 1e-3
    assert abs(got["trend"] - b / 100) < 1e-3
    assert abs(got["next_seasonal"] - seas[0] / 100) < 1e-3
    assert abs(got["forecast_next"] - (l + b + seas[0]) / 100) < 1e-3
    assert (
        abs(got["rmse_1step"] - math.sqrt(sse / (len(xs) - m)) / 100) < 1e-3
    )
    # the seasonal model must beat no worse than... sanity: rmse finite, >0
    assert got["rmse_1step"] > 0


def test_nn_matching_att_matches_python(spark):
    from bigdata_carprice_assignment_spark.sources.readers import load_table

    orders = {
        r["o_orderkey"]: r
        for r in load_table(spark, SF, "orders").collect()
    }
    def _day(d):
        return d.date() if hasattr(d, "hour") else d

    lags = defaultdict(list)
    for r in load_table(spark, SF, "lineitem").collect():
        o = orders.get(r["l_orderkey"])
        if o is not None:
            lags[r["l_orderkey"]].append(
                (_day(r["l_shipdate"]) - _day(o["o_orderdate"])).days
            )
    rows = []
    for k, o in orders.items():
        if o["o_orderpriority"] not in ("1-URGENT", "5-LOW") or k not in lags:
            continue
        mon = (o["o_orderdate"].year, o["o_orderdate"].month)
        rows.append(
            (
                mon,
                float(o["o_totalprice"]),
                k,
                o["o_orderpriority"] == "1-URGENT",
                sum(lags[k]) / len(lags[k]),
            )
        )
    by_mon = defaultdict(list)
    for r in rows:
        by_mon[r[0]].append(r)
    n_treated = n_matched = 0
    att, gaps = [], []
    for mon, rs in by_mon.items():
        rs.sort(key=lambda r: (r[1], r[2]))
        for i, (mo, price, k, treated, out) in enumerate(rs):
            if not treated:
                continue
            n_treated += 1
            prev = next_ = None
            for j in range(i - 1, -1, -1):
                if not rs[j][3]:
                    prev = rs[j]
                    break
            for j in range(i + 1, len(rs)):
                if not rs[j][3]:
                    next_ = rs[j]
                    break
            if prev is None and next_ is None:
                continue
            if next_ is None or (
                prev is not None and price - prev[1] <= next_[1] - price
            ):
                gap, m_out = price - prev[1], prev[4]
            else:
                gap, m_out = next_[1] - price, next_[4]
            if gap <= 500.0:
                n_matched += 1
                att.append(out - m_out)
                gaps.append(gap)
    got = registry.QUERIES["nn_matching_att_urgent_lag"](spark, SF).collect()[0]
    assert got["n_treated"] == n_treated
    assert got["n_matched"] == n_matched
    assert abs(got["att_ship_lag_days"] - sum(att) / len(att)) < 1e-5
    assert abs(got["avg_price_gap"] - sum(gaps) / len(gaps)) < 1e-3


def test_session_trigrams_match_python(spark):
    from bigdata_carprice_assignment_spark.sources.readers import load_table

    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    tri = Counter()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    for rows in by_user.values():
        sid = 0
        sids = []
        for i, r in enumerate(rows):
            if i == 0 or (r["ts"] - rows[i - 1]["ts"]).total_seconds() > 1800:
                sid += 1
            sids.append(sid)
        for i in range(len(rows) - 2):
            if sids[i] == sids[i + 2]:
                tri[
                    ">".join(
                        rows[i + j]["event_type"] for j in range(3)
                    )
                ] += 1
    want = sorted(tri.items(), key=lambda t: (-t[1], t[0]))[:10]
    got = [
        (r["trigram"], r["n"])
        for r in registry.QUERIES["session_event_trigrams_top"](
            spark, SF
        ).collect()
    ]
    assert got == want


def test_qq_period_drift_matches_numpy(spark):
    from bigdata_carprice_assignment_spark.sources.readers import load_table

    rows = load_table(spark, SF, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    days = [r["o_orderdate"] for r in rows]
    mid_days = (max(days) - min(days)).days // 2
    import datetime

    mid = min(days) + datetime.timedelta(days=mid_days)
    early = sorted(float(r["o_totalprice"]) for r in rows if r["o_orderdate"] < mid)
    late = sorted(float(r["o_totalprice"]) for r in rows if r["o_orderdate"] >= mid)
    got = registry.QUERIES["order_value_qq_period_drift"](spark, SF).collect()
    assert len(got) == 9
    for r in got:
        p = r["decile"]
        qe = float(np.quantile(np.array(early), p, method="linear"))
        ql = float(np.quantile(np.array(late), p, method="linear"))
        assert abs(r["q_early"] - qe) < 1e-2
        assert abs(r["q_late"] - ql) < 1e-2
        assert abs(r["qq_gap"] - (ql - qe)) < 2e-2
