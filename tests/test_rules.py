"""Tier-3/4 property tests for the mining operators (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_carprice_assignment_spark.operators import rules as R
from bigdata_carprice_assignment_spark.queries.mining import part_transactions


def test_fpgrowth_1to1_rules_match_pair_miner(spark, sf_smoke):
    """FP-Growth ≡ pair-miner on the 1-item-antecedent subset (same
    supports/confidences at equal thresholds)."""
    tx = part_transactions(spark, sf_smoke)
    _, fp = R.mine_rules(tx, min_support=0.02, min_confidence=0.1, max_len=2)
    fp_pairs = {
        (r["antecedent"][0], r["consequent"][0]): (
            round(r["support"], 9),
            round(r["confidence"], 9),
        )
        for r in fp.filter(F.size("antecedent") == 1).collect()
    }
    pr = {
        (r["antecedent"], r["consequent"]): (
            round(r["support"], 9),
            round(r["confidence"], 9),
        )
        for r in R.pair_rules(tx, min_support=0.02, min_confidence=0.1).collect()
    }
    assert fp_pairs == pr
    assert len(fp_pairs) > 0


def test_prune_redundant_soundness(spark, sf_smoke):
    """No surviving rule may have a strictly-more-general sibling with
    >= confidence (the is.redundant definition)."""
    tx = part_transactions(spark, sf_smoke)
    _, rules = R.mine_rules(tx, min_support=0.02, min_confidence=0.1)
    kept = R.prune_redundant(rules)
    kept_rows = [
        (frozenset(r["antecedent"]), tuple(r["consequent"]), r["confidence"])
        for r in kept.collect()
    ]
    all_rows = [
        (frozenset(r["antecedent"]), tuple(r["consequent"]), r["confidence"])
        for r in rules.collect()
    ]
    assert len(kept_rows) <= len(all_rows)
    for ant, cons, conf in kept_rows:
        for ant2, cons2, conf2 in all_rows:
            if cons2 == cons and ant2 < ant and conf2 >= conf:
                raise AssertionError(f"redundant rule survived: {ant}→{cons}")


def test_prune_redundant_drops_known_redundancy(spark):
    """{A,B}→{C} is redundant given {A}→{C} at equal confidence."""
    rows = [
        (["A"], ["C"], 1.0, 0.5, 2.0),
        (["A", "B"], ["C"], 1.0, 0.25, 2.0),
        (["B"], ["D"], 0.8, 0.4, 1.5),
    ]
    rules = spark.createDataFrame(
        rows,
        "antecedent array<string>, consequent array<string>, "
        "confidence double, support double, lift double",
    )
    kept = {tuple(r["antecedent"]) for r in R.prune_redundant(rules).collect()}
    assert kept == {("A",), ("B",)}


def test_interest_measures_ranges(spark, sf_smoke):
    tx = part_transactions(spark, sf_smoke)
    rules = R.pair_rules(tx, min_support=0.01, min_confidence=0.05)
    m = R.interest_measures(rules, n_tx=tx.count()).collect()
    assert m
    for r in m:
        assert 0.0 <= r["support"] <= 1.0
        assert 0.0 <= r["confidence"] <= 1.0
        assert 0.0 <= r["coverage"] <= 1.0
        assert 0.0 <= r["cosine"] <= 1.0
        assert -0.25 <= r["leverage"] <= 0.25
        assert r["chi2"] >= 0.0
        if r["conviction"] is not None:
            assert r["conviction"] >= 0.0


def test_transactions_skip_nulls(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "x")], "c1 string, c2 string"
    )
    tx = R.to_transactions(df, ["c1", "c2"]).collect()
    assert sorted(len(r["items"]) for r in tx) == [1, 2]
