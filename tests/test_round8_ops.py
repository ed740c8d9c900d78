"""Round-8 operator derivation tests: each new exact query's MECHANISM
is re-derived in pure python/numpy independently of both engines — the
DuckDB oracle proves Spark↔DuckDB agreement, these prove both match the
published algorithm (OLS train/test metrics, loess, gaussian NB, Lloyd
k-means, CART split search, LSH table sizing).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pytest

from bigdata_carprice_assignment_spark import registry
from bigdata_carprice_assignment_spark.queries.carprice import (
    _CLEANED_ORACLE,
    _KM_FEATS,
    _KM_ITERS,
    _LM_PREDS,
    _LM_SPLIT_SALT,
    _NB_FEATS,
    _NB_SPLIT_SALT,
    _TREE_FEATS,
    _TREE_MINBUCKET,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cleaned_pdf():
    return duckdb.connect().execute(_CLEANED_ORACLE).df()


def _run(name):
    from bigdata_carprice_assignment_spark.session import get_spark

    return registry.QUERIES[name](get_spark(), SF)


def test_lm_metrics_split_and_values_match_numpy(spark):
    """Re-derive the whole M1+M3+M4 chain in numpy: portable-hash
    split, lstsq OLS on log1p(price), $-scale metrics on exp(pred)−1 —
    the query must agree to float tolerance (its own path is the
    closed-form Cholesky)."""
    from bigdata_carprice_assignment_spark.queries.carprice import (
        _ml_matrix_with_key,
    )

    ml = _ml_matrix_with_key(spark, SF).toPandas()
    keep = np.array(
        [
            _h60(f"lmsplit{_LM_SPLIT_SALT}:{int(k)}") % 10_000 < 8_000
            for k in ml["car_key"]
        ]
    )
    tr, te = ml[keep], ml[~keep]
    X = np.column_stack(
        [np.ones(len(tr))] + [tr[c].to_numpy(float) for c in _LM_PREDS]
    )
    yl = np.log1p(tr["price"].to_numpy(float))
    beta = np.linalg.lstsq(X, yl, rcond=None)[0]
    Xt = np.column_stack(
        [np.ones(len(te))] + [te[c].to_numpy(float) for c in _LM_PREDS]
    )
    ph = np.exp(Xt @ beta) - 1
    y = te["price"].to_numpy(float)
    rmse = math.sqrt(float(np.mean((ph - y) ** 2)))
    mae = float(np.mean(np.abs(ph - y)))
    r2 = 1 - float(np.sum((ph - y) ** 2)) / float(np.sum((y - y.mean()) ** 2))
    row = _run("carprice_lm_metrics_exact").collect()[0]
    assert row["n_train"] == int(keep.sum())
    assert row["n_test"] == int((~keep).sum())
    assert row["rmse_usd"] == pytest.approx(rmse, abs=0.011)
    assert row["mae_usd"] == pytest.approx(mae, abs=0.011)
    assert row["r2"] == pytest.approx(r2, abs=1e-5)
    # every brand level must keep >=1 train row (the salt contract)
    for c in _LM_PREDS:
        if c.startswith("brand_"):
            assert tr[c].sum() >= 1.0, f"{c} has no train rows"


def test_loess_matches_numpy(spark):
    """The distributed loess must reproduce the tricube local-linear
    numpy fit at every grid point."""
    pdf = _cleaned_pdf()
    x = pdf["horsepower"].to_numpy(float)
    y = pdf["price"].to_numpy(float)
    n = len(x)
    k = max(2, math.ceil(0.75 * n))
    lo, hi = x.min(), x.max()
    got = {
        r["horsepower"]: r["smoothed_price"]
        for r in _run("carprice_loess_smooth").collect()
    }
    assert len(got) == 40
    for i in range(40):
        g = lo + (hi - lo) * i / 39
        d = np.abs(x - g)
        h = np.partition(d, k - 1)[k - 1] or 1.0
        w = np.clip(1 - (d / h) ** 3, 0, None) ** 3
        sw, swx, swy = w.sum(), (w * x).sum(), (w * y).sum()
        swxx, swxy = (w * x * x).sum(), (w * x * y).sum()
        sxx = swxx - swx * swx / sw
        slope = 0.0 if sxx == 0 else (swxy - swx * swy / sw) / sxx
        want = swy / sw + slope * (g - swx / sw)
        assert got[round(g, 4)] == pytest.approx(want, abs=0.02)


def test_gaussian_nb_matches_numpy(spark):
    """Confusion matrix re-derived with numpy gaussian NB (var ddof=1,
    ln prior + sum of log densities, class-name tie-break)."""
    pdf = _cleaned_pdf()
    keys = np.floor(pdf["car_id"].to_numpy(float)).astype(int)
    keep = np.array(
        [_h60(f"nbsplit{_NB_SPLIT_SALT}:{k}") % 10_000 < 8_000 for k in keys]
    )
    tr, te = pdf[keep], pdf[~keep]
    classes = sorted(tr["price_bucket"].unique())
    stats = {}
    for c in classes:
        sub = tr[tr["price_bucket"] == c]
        stats[c] = (
            len(sub) / len(tr),
            {f: (sub[f].mean(), sub[f].var(ddof=1)) for f in _NB_FEATS},
        )
    want: dict[tuple, int] = {}
    for _, r in te.iterrows():
        best, bll = None, None
        for c in classes:
            prior, fs = stats[c]
            ll = math.log(prior)
            for f in _NB_FEATS:
                m, v = fs[f]
                ll += -0.5 * math.log(2 * math.pi * v) - (r[f] - m) ** 2 / (
                    2 * v
                )
            if bll is None or ll > bll or (ll == bll and c < best):
                best, bll = c, ll
        key = (r["price_bucket"], best)
        want[key] = want.get(key, 0) + 1
    got = {
        (r["actual"], r["predicted"]): r["n"]
        for r in _run("carprice_gaussian_nb_confusion_exact").collect()
    }
    assert got == want
    # accuracy sanity: far better than the 25% random-bucket baseline
    acc = sum(n for (a, p), n in got.items() if a == p) / sum(got.values())
    assert acc > 0.6


def test_kmeans_lloyd_matches_numpy(spark):
    """8 Lloyd rounds from the ±0.5 moment-split init with 9dp center
    rounding, re-derived in numpy; sizes, unscaled centers, WSS."""
    pdf = _cleaned_pdf()
    X = pdf[_KM_FEATS].to_numpy(float)
    m, s = X.mean(axis=0), X.std(axis=0, ddof=1)
    Z = np.round((X - m) / s, 9)
    a = np.full(len(_KM_FEATS), 0.5)
    b = np.full(len(_KM_FEATS), -0.5)
    for _ in range(_KM_ITERS):
        da = ((Z - a) ** 2).sum(axis=1)
        db = ((Z - b) ** 2).sum(axis=1)
        mask = da <= db
        a = np.round(Z[mask].mean(axis=0), 9)
        b = np.round(Z[~mask].mean(axis=0), 9)
    da = ((Z - a) ** 2).sum(axis=1)
    db = ((Z - b) ** 2).sum(axis=1)
    mask = da <= db
    rows = {r["cluster"]: r for r in _run("carprice_kmeans_lloyd_exact").collect()}
    assert rows["c1"]["n_cars"] == int(mask.sum())
    assert rows["c2"]["n_cars"] == int((~mask).sum())
    assert rows["c1"]["wss"] == pytest.approx(float(da[mask].sum()), abs=1e-2)
    assert rows["c2"]["wss"] == pytest.approx(float(db[~mask].sum()), abs=1e-2)
    for i, f in enumerate(_KM_FEATS):
        assert rows["c1"][f] == pytest.approx(m[i] + s[i] * a[i], abs=1e-3)
        assert rows["c2"][f] == pytest.approx(m[i] + s[i] * b[i], abs=1e-3)
    # the two clusters must actually separate price (cheap vs premium)
    assert abs(rows["c1"]["price"] - rows["c2"]["price"]) > 3000


def test_tree_depth2_matches_numpy(spark):
    """Exact CART split search re-derived by brute force in numpy
    (distinct-value thresholds, minbucket, 9dp-rounded SSE argmin with
    (feat, thr) tie-break)."""
    pdf = _cleaned_pdf()
    y = np.log1p(pdf["price"].to_numpy(float))
    feats = {f: pdf[f].to_numpy(float) for f in _TREE_FEATS}

    def best(idx):
        out = []
        for f in sorted(_TREE_FEATS):
            xv = feats[f][idx]
            for thr in np.unique(xv):
                lm = xv <= thr
                nl, nr = int(lm.sum()), int((~lm).sum())
                if nl < _TREE_MINBUCKET or nr < _TREE_MINBUCKET:
                    continue
                yl, yr = y[idx][lm], y[idx][~lm]
                sse = round(
                    float((yl**2).sum() - yl.sum() ** 2 / nl)
                    + float((yr**2).sum() - yr.sum() ** 2 / nr),
                    9,
                )
                out.append((sse, f, float(thr), nl, nr))
        return min(out)

    all_idx = np.arange(len(y))
    sse, f, thr, nl, nr = best(all_idx)
    rows = {r["node"]: r for r in _run("carprice_tree_depth2_exact").collect()}
    assert rows["root"]["split_feature"] == f
    assert rows["root"]["split_threshold"] == pytest.approx(thr)
    assert rows["root"]["n"] == nl + nr
    lidx = all_idx[feats[f][all_idx] <= thr]
    ridx = all_idx[feats[f][all_idx] > thr]
    for node, idx in (("L", lidx), ("R", ridx)):
        s2, f2, t2, n2l, n2r = best(idx)
        assert rows[node]["split_feature"] == f2
        assert rows[node]["split_threshold"] == pytest.approx(t2)
        assert rows[node]["n"] == n2l + n2r
        assert rows[node]["split_sse"] == pytest.approx(s2, abs=1e-5)
    # leaves partition the children
    assert rows["LL"]["n"] + rows["LR"]["n"] == rows["L"]["n"]
    assert rows["RL"]["n"] + rows["RR"]["n"] == rows["R"]["n"]
    # depth-2 means must order along the price gradient at the root
    assert rows["LL"]["mean_log_price"] < rows["RR"]["mean_log_price"]


def test_ranked_rules_pin_order(spark):
    """Rank column must be 1..20 with lift non-increasing and the
    (lift, antecedent, consequent) tie-break respected — this is what
    makes T2/T3 hash-pinnable."""
    rows = _run("fpgrowth_rules_ranked_top20").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= 20
    keys = [(-r["lift"], r["antecedent"], r["consequent"]) for r in rows]
    assert keys == sorted(keys)


def test_srp_production_profile_is_half_the_tables():
    """miss=1e-2 at the SAME design cosine must cost exactly
    ceil(half) the tables of the 1e-4 contract at every adaptive
    width (ln 1e-2 / ln 1e-4 = 1/2); lowering design_cos to 0.90
    instead must NOT be cheap (the false-economy the round-8 gate
    documents)."""
    from bigdata_carprice_assignment_spark.llm.similarity import (
        srp_adaptive_bands,
    )

    for bits in range(10, 21):
        tight = srp_adaptive_bands(bits, 0.94, 1e-4)
        cheap = srp_adaptive_bands(bits, 0.94, 1e-2)
        assert cheap <= math.ceil(tight / 2) + 1
        loose_cos = srp_adaptive_bands(bits, 0.90, 1e-2)
        assert loose_cos > cheap  # not the cheap knob


def test_hamming_screen_sized_from_gate_threshold():
    """The adaptive hamming screen must keep a true 0.85-cosine pair
    with ≥6σ margin at every adaptive width (the round-7 leak: a
    screen derived from the 0.90 design angle loses 0.85-pairs as
    signatures widen), while the random bulk stays >10σ above it."""
    p85 = math.acos(0.85) / math.pi
    for wide_bits in (600, 1140, 1860):
        mu = wide_bits * p85
        sd = math.sqrt(wide_bits * p85 * (1 - p85))
        thr = math.ceil(mu + 6.0 * sd)
        # miss for a true 0.85 pair: P[ham > mu + 6 sd] — normal bound
        assert (thr - mu) / sd >= 6.0
        # bulk at theta ~ pi/2: E[ham] = wide_bits/2
        mu_b = wide_bits / 2
        sd_b = math.sqrt(wide_bits * 0.25)
        assert (mu_b - thr) / sd_b > 10.0


def test_gbt_boost_matches_numpy(spark):
    """3 boosting rounds of depth-1 stumps (squared loss, shrinkage
    0.5, 9dp-rounded leaf values) re-derived in numpy."""
    from bigdata_carprice_assignment_spark.queries.carprice import (
        _GBT_ROUNDS,
        _GBT_SHRINK,
    )

    pdf = _cleaned_pdf()
    y0 = np.log1p(pdf["price"].to_numpy(float))
    feats = {f: pdf[f].to_numpy(float) for f in _TREE_FEATS}
    f0 = float(y0.mean())
    r = y0 - f0
    want = [("f0", None, None, round(f0, 6), None)]
    for t in range(1, _GBT_ROUNDS + 1):
        cands = []
        for f in sorted(_TREE_FEATS):
            xv = feats[f]
            for thr in np.unique(xv):
                lm = xv <= thr
                nl, nr = int(lm.sum()), int((~lm).sum())
                if nl < _TREE_MINBUCKET or nr < _TREE_MINBUCKET:
                    continue
                rl, rr = r[lm], r[~lm]
                sse = round(
                    float((rl**2).sum() - rl.sum() ** 2 / nl)
                    + float((rr**2).sum() - rr.sum() ** 2 / nr),
                    9,
                )
                cands.append((sse, f, float(thr), nl, nr))
        sse, f, thr, nl, nr = min(cands)
        lm = feats[f] <= thr
        lv = round(float(r[lm].mean()), 9)
        rv = round(float(r[~lm].mean()), 9)
        want.append((f"round{t}", f, round(thr, 6), round(lv, 6), round(rv, 6)))
        r = r - _GBT_SHRINK * np.where(lm, lv, rv)
    want.append(
        (
            "final_train_rmse_log",
            None,
            None,
            round(math.sqrt(float((r**2).mean())), 6),
            None,
        )
    )
    got = [
        (
            x["step"],
            x["split_feature"],
            x["split_threshold"],
            x["left_value"],
            x["right_value"],
        )
        for x in _run("carprice_gbt_boost_exact").collect()
    ]
    for w, g in zip(want, got):
        assert w[0] == g[0] and w[1] == g[1]
        for wi, gi in zip(w[2:], g[2:]):
            if wi is None:
                assert gi is None
            else:
                assert gi == pytest.approx(wi, abs=2e-6)
    # boosting must reduce training RMSE vs the constant model
    assert want[-1][3] < math.sqrt(float(((y0 - f0) ** 2).mean()))


def test_bagged_stumps_matches_numpy(spark):
    """8 hash-bagged exact stumps + ensemble mean re-derived in numpy."""
    from bigdata_carprice_assignment_spark.queries.carprice import (
        _BAG_COUNT,
        _BAG_KEEP,
    )

    pdf = _cleaned_pdf()
    keys = np.floor(pdf["car_id"].to_numpy(float)).astype(int)
    y = np.log1p(pdf["price"].to_numpy(float))
    feats = {f: pdf[f].to_numpy(float) for f in _TREE_FEATS}
    thr_pm = int(round(_BAG_KEEP * 10_000))

    def best(mask):
        out = []
        for f in sorted(_TREE_FEATS):
            xv = feats[f][mask]
            for thr in np.unique(xv):
                lm = xv <= thr
                nl, nr = int(lm.sum()), int((~lm).sum())
                if nl < _TREE_MINBUCKET or nr < _TREE_MINBUCKET:
                    continue
                yl, yr = y[mask][lm], y[mask][~lm]
                sse = round(
                    float((yl**2).sum() - yl.sum() ** 2 / nl)
                    + float((yr**2).sum() - yr.sum() ** 2 / nr),
                    9,
                )
                out.append((sse, f, float(thr), yl.mean(), yr.mean(), nl + nr))
        return min(out)

    got = {r["member"]: r for r in _run("carprice_bagged_stumps_exact").collect()}
    pred = np.zeros(len(y))
    for g in range(_BAG_COUNT):
        mask = np.array(
            [_h60(f"bag{g}:{k}") % 10_000 < thr_pm for k in keys]
        )
        sse, f, thr, lm_mean, rm_mean, n_bag = best(mask)
        r = got[f"bag{g}"]
        assert r["split_feature"] == f
        assert r["split_threshold"] == pytest.approx(thr)
        assert r["left_value"] == pytest.approx(round(lm_mean, 9), abs=2e-6)
        assert r["right_value"] == pytest.approx(round(rm_mean, 9), abs=2e-6)
        assert r["n_bag"] == n_bag
        lv, rv = round(lm_mean, 9), round(rm_mean, 9)
        pred += np.where(feats[f] <= thr, lv, rv)
    pred /= _BAG_COUNT
    rmse = math.sqrt(float(((pred - y) ** 2).mean()))
    assert got["ensemble"]["left_value"] == pytest.approx(rmse, abs=2e-6)
    # averaging must beat the mean single-stump RMSE (variance reduction)
    assert rmse < 0.35


def test_lm_metrics_stratified_split(spark):
    """The stratified variant must split ~80/20 WITHIN each price
    bucket and report metrics in the same ballpark as the plain
    split (same model family, different 20% holdout)."""
    from bigdata_carprice_assignment_spark.queries.carprice import (
        _LM_STRAT_SALT,
    )

    pdf = _cleaned_pdf()
    keys = np.floor(pdf["car_id"].to_numpy(float)).astype(int)
    keep = np.array(
        [
            _h60(f"strat{_LM_STRAT_SALT}:{b}:{k}") % 10_000 < 8_000
            for b, k in zip(pdf["price_bucket"], keys)
        ]
    )
    row = _run("carprice_lm_metrics_stratified_exact").collect()[0]
    assert row["n_train"] == int(keep.sum())
    assert row["n_test"] == int((~keep).sum())
    # per-bucket 80/20 within a few rows
    for b in pdf["price_bucket"].unique():
        m = pdf["price_bucket"].to_numpy() == b
        frac = keep[m].mean()
        assert 0.65 <= frac <= 0.95, (b, frac)
    assert 0.5 < row["r2"] <= 1.0
    plain = _run("carprice_lm_metrics_exact").collect()[0]
    assert abs(row["r2"] - plain["r2"]) < 0.35


def test_kde_nb_exact_matches_numpy(spark):
    """The full kernel-density NB pipeline re-derived in numpy:
    bw.nrd0 bandwidths (type-7 IQR), 512-point grids, index-linear
    interpolation with zeros outside, 0.001 floor, argmax."""
    from bigdata_carprice_assignment_spark.queries.carprice import (
        _KDE_CUT,
        _KDE_FEATS,
        _KDE_GRID,
        _KDE_THRESHOLD,
    )

    pdf = _cleaned_pdf()
    keys = np.floor(pdf["car_id"].to_numpy(float)).astype(int)
    keep = np.array(
        [_h60(f"nbsplit{_NB_SPLIT_SALT}:{k}") % 10_000 < 8_000 for k in keys]
    )
    tr, te = pdf[keep], pdf[~keep]
    classes = sorted(tr["price_bucket"].unique())
    g = _KDE_GRID - 1
    grids = {}
    priors = {}
    for c in classes:
        sub = tr[tr["price_bucket"] == c]
        priors[c] = len(sub) / len(tr)
        for fi, f in enumerate(_KDE_FEATS):
            v = sub[f].to_numpy(float)
            n = len(v)
            sd = v.std(ddof=1)
            q1, q3 = np.quantile(v, [0.25, 0.75])  # type 7 = linear
            bw = 0.9 * min(sd, (q3 - q1) / 1.349) * n ** (-0.2)
            lo, hi = v.min() - _KDE_CUT * bw, v.max() + _KDE_CUT * bw
            gx = lo + (hi - lo) * np.arange(_KDE_GRID) / g
            gd = np.exp(
                -0.5 * ((v[None, :] - gx[:, None]) / bw) ** 2
            ).sum(axis=1) / (n * bw * math.sqrt(2 * math.pi))
            grids[(c, fi)] = (lo, hi, gd)
    want: dict[tuple, int] = {}
    for _, r in te.iterrows():
        best, bll = None, None
        for c in classes:
            ll = math.log(priors[c])
            for fi, f in enumerate(_KDE_FEATS):
                lo, hi, gd = grids[(c, fi)]
                pos = (r[f] - lo) / (hi - lo) * g
                if pos < 0 or pos > g:
                    dv = 0.0
                else:
                    i0 = int(math.floor(pos))
                    d1 = gd[i0 + 1] if i0 + 1 <= g else gd[i0]
                    dv = gd[i0] + (d1 - gd[i0]) * (pos - i0)
                ll += math.log(max(dv, _KDE_THRESHOLD))
            if bll is None or ll > bll or (ll == bll and c < best):
                best, bll = c, ll
        key = (r["price_bucket"], best)
        want[key] = want.get(key, 0) + 1
    got = {
        (r["actual"], r["predicted"]): r["n"]
        for r in _run("carprice_kde_nb_confusion_exact").collect()
    }
    assert got == want
    acc = sum(n for (a, p), n in got.items() if a == p) / sum(got.values())
    assert acc > 0.5  # kernel NB beats the 25% random baseline soundly


def test_training_shard_manifest_mechanism(spark):
    """Shard assignment and order keys re-derived with hashlib; the
    manifest must partition the corpus exactly and witness the order."""
    import duckdb

    docs = duckdb.connect().execute(
        "SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS nt"
        " FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).df()
    want: dict[int, list] = {}
    for _, r in docs.iterrows():
        k = _h60(f"epoch0:{r['doc_id']}")
        want.setdefault(k % 32, []).append((k, int(r["nt"])))
    rows = _run("training_shard_manifest").collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    for r in rows:
        ks = want[r["shard"]]
        assert r["n_docs"] == len(ks)
        assert r["n_tokens"] == sum(t for _, t in ks)
        assert r["first_key"] == min(k for k, _ in ks)
        assert r["last_key"] == max(k for k, _ in ks)
    # hash sharding must be reasonably balanced on this corpus
    assert rows[0]["max_over_avg_docs"] < 3.0
