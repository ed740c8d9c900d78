"""Association-rule mining operators (SURVEY.md §2.8 M14-M17, §2.4 A10/A11,
§2.7 H5).

Reference: arules ``apriori`` over 205 transactions
(BigDataProject.R:554-563; associationRules.R:76-369). Spark-first design:

- Transaction encoding is a single projection building an
  ``array<string>`` of ``"col=value"`` items (no itemMatrix — Spark's
  FPGrowth consumes arrays directly).
- The general miner is ``pyspark.ml.fpm.FPGrowth`` (distributed FP-Growth;
  produces the same frequent itemsets/rules as Apriori at equal
  thresholds) with post-filters for arules' ``minlen``/``maxlen`` and its
  1-item-consequent convention.
- A *pair-rule* miner (1-item antecedent → 1-item consequent) is also
  provided as pure DataFrame algebra (explode → self-join → counts):
  it is DuckDB-oracle-checkable and scales as one shuffle on item id.
- Redundancy pruning (M15, ``!is.redundant(rules)``) is a DataFrame
  self-join: drop rule R when a strictly-more-general rule R' (same
  consequent, antecedent ⊂, confidence ≥) exists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # pyspark.ml requires numpy at import; gate defensively
    from pyspark.ml.fpm import FPGrowth

    _HAS_ML = True
except ImportError:  # pragma: no cover
    _HAS_ML = False


def to_transactions(
    df: DataFrame, cols: Sequence[str], id_col: str | None = None
) -> DataFrame:
    """M14 input: encode categorical columns as an items array of
    ``"col=value"`` strings (``as(trans_df, 'transactions')`` at
    BigDataProject.R:561). Null values are skipped (arules drops NA
    items) via array_compact."""
    items = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(c).isNotNull(), F.concat_ws("=", F.lit(c), F.col(c).cast("string"))
                )
                for c in cols
            ]
        )
    )
    keep = [id_col] if id_col else []
    return df.select(*keep, items.alias("items"))


def mine_rules(
    transactions: DataFrame,
    min_support: float = 0.1,
    min_confidence: float = 0.6,
    min_len: int = 2,
    max_len: int = 4,
    items_col: str = "items",
):
    """M14: FPGrowth with arules-parity post-filters.

    Returns (model, rules_df); rules_df columns: antecedent (array),
    consequent (array, filtered to exactly 1 item to match arules),
    confidence, lift, support; rule length (|antecedent|+1) restricted to
    [min_len, max_len] — FPGrowth has no native minlen/maxlen, the filter
    runs on the (small) rules output (SURVEY.md M14 note).
    """
    if not _HAS_ML:  # pragma: no cover
        raise ImportError("pyspark.ml unavailable")
    fp = FPGrowth(
        itemsCol=items_col, minSupport=min_support, minConfidence=min_confidence
    )
    model = fp.fit(transactions)
    rules = model.associationRules.filter(
        (F.size("consequent") == 1)
        & (F.size("antecedent") + 1 >= min_len)
        & (F.size("antecedent") + 1 <= max_len)
    )
    return model, rules


def pair_rules(
    transactions: DataFrame,
    min_support: float = 0.05,
    min_confidence: float = 0.3,
    items_col: str = "items",
) -> DataFrame:
    """1→1 association rules as pure DataFrame algebra (oracle-checkable
    subset of M14). One explode + one self-join on transaction id + two
    hash aggs; co-occurrence pairs shuffle on id — scales linearly in
    transactions since items-per-transaction is small and bounded."""
    ids = transactions.select(
        F.monotonically_increasing_id().alias("_tid"), F.col(items_col).alias("items")
    )
    exploded = ids.select("_tid", F.explode("items").alias("item"))
    n_tx = transactions.count()
    supports = exploded.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    a = exploded.select(F.col("_tid"), F.col("item").alias("antecedent"))
    b = exploded.select(F.col("_tid"), F.col("item").alias("consequent"))
    pairs = (
        a.join(b, "_tid")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("both_cnt"))
    )
    sa = supports.select(
        F.col("item").alias("antecedent"), F.col("cnt").alias("ant_cnt")
    )
    sb = supports.select(
        F.col("item").alias("consequent"), F.col("cnt").alias("cons_cnt")
    )
    out = (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .select(
            "antecedent",
            "consequent",
            (F.col("both_cnt") / F.lit(n_tx)).alias("support"),
            (F.col("both_cnt") / F.col("ant_cnt")).alias("confidence"),
            (
                (F.col("both_cnt") / F.col("ant_cnt")) / (F.col("cons_cnt") / F.lit(n_tx))
            ).alias("lift"),
            (F.col("ant_cnt") / F.lit(n_tx)).alias("coverage"),
            (F.col("cons_cnt") / F.lit(n_tx)).alias("cons_support"),
            "both_cnt",
        )
        .filter(
            (F.col("support") >= min_support) & (F.col("confidence") >= min_confidence)
        )
    )
    return out


def interest_measures(rules: DataFrame, n_tx: int | None = None) -> DataFrame:
    """H5: ``interestMeasure(...)`` (associationRules.R:201-207) as pure
    column arithmetic over a rules DataFrame that carries
    support/confidence/coverage/cons_support (pair_rules output shape).

    coverage   = supp(A)
    leverage   = supp(A∪B) − supp(A)·supp(B)
    conviction = (1 − supp(B)) / (1 − conf)   (inf when conf=1 → null)
    cosine     = supp(A∪B) / sqrt(supp(A)·supp(B))
    odds_ratio & chi2 from the implicit 2×2 contingency when n_tx given.
    """
    supp_a = F.col("coverage")
    supp_b = F.col("cons_support")
    supp = F.col("support")
    conf = F.col("confidence")
    out = (
        rules.withColumn("leverage", supp - supp_a * supp_b)
        .withColumn(
            "conviction",
            F.when(conf < 1.0, (1.0 - supp_b) / (1.0 - conf)),
        )
        .withColumn("cosine", supp / F.sqrt(supp_a * supp_b))
    )
    if n_tx is not None:
        n = F.lit(float(n_tx))
        n11 = supp * n
        n10 = (supp_a - supp) * n
        n01 = (supp_b - supp) * n
        n00 = n - n11 - n10 - n01
        expected = lambda r, c: r * c / n  # noqa: E731
        e11 = expected(supp_a * n, supp_b * n)
        e10 = expected(supp_a * n, n - supp_b * n)
        e01 = expected(n - supp_a * n, supp_b * n)
        e00 = expected(n - supp_a * n, n - supp_b * n)
        out = out.withColumn(
            "chi2",
            (n11 - e11) ** 2 / e11
            + (n10 - e10) ** 2 / e10
            + (n01 - e01) ** 2 / e01
            + (n00 - e00) ** 2 / e00,
        ).withColumn(
            "odds_ratio",
            F.when((n10 > 0) & (n01 > 0), (n11 * n00) / (n10 * n01)),
        )
    return out


def prune_redundant(rules: DataFrame) -> DataFrame:
    """M15: drop rule R if a more-general rule R' exists with the same
    consequent, antecedent(R') ⊊ antecedent(R), confidence(R') ≥
    confidence(R) (``is.redundant``, associationRules.R:121).

    DataFrame algebra: self-join on consequent; subset test via
    ``array_except(general, specific) == []``; anti-join survivors.
    Rules output is small (≪ data), so the self-join is cheap; still
    expressed distributed for arbitrarily large rule sets.
    """
    r = rules.withColumn("_rid", F.monotonically_increasing_id())
    spec = r.select(
        F.col("_rid"),
        F.col("antecedent").alias("_ant_s"),
        F.col("consequent").alias("_cons"),
        F.col("confidence").alias("_conf_s"),
    )
    gen = r.select(
        F.col("antecedent").alias("_ant_g"),
        F.col("consequent").alias("_cons"),
        F.col("confidence").alias("_conf_g"),
    )
    redundant = (
        spec.join(gen, "_cons")
        .filter(
            (F.size("_ant_g") < F.size("_ant_s"))
            & (F.size(F.array_except("_ant_g", "_ant_s")) == 0)
            & (F.col("_conf_g") >= F.col("_conf_s"))
        )
        .select("_rid")
        .distinct()
    )
    return (
        r.join(redundant, "_rid", "left_anti")
        .drop("_rid")
    )


def subset_rules(
    rules: DataFrame,
    rhs_in: Sequence[str] | None = None,
    lhs_contains: str | None = None,
) -> DataFrame:
    """M16/F12: arules ``subset(rules, rhs %in% ... / lhs %pin% ...)``
    (associationRules.R:146-148, 219-237) as array predicates."""
    out = rules
    if rhs_in is not None:
        pred: Column = F.lit(False)
        for v in rhs_in:
            pred = pred | F.array_contains("consequent", v)
        out = out.filter(pred)
    if lhs_contains is not None:
        out = out.filter(
            F.exists("antecedent", lambda x: x.contains(F.lit(lhs_contains)))
        )
    return out


def per_group_mining(
    df: DataFrame,
    label_col: str,
    item_cols: Sequence[str],
    min_support: float = 0.2,
    min_confidence: float = 0.6,
) -> DataFrame:
    """M17: re-mine rules per segment (associationRules.R:349-369).

    Driver loop over the (tiny) label set, one FPGrowth job per label —
    the reference's structure, documented as loop-over-jobs. Labels are
    few (clusters); each job is independently distributed.
    """
    labels = [r[0] for r in df.select(label_col).distinct().orderBy(label_col).collect()]
    out: DataFrame | None = None
    for v in labels:
        tx = to_transactions(df.filter(F.col(label_col) == v), item_cols)
        _, rules = mine_rules(tx, min_support, min_confidence)
        tagged = rules.withColumn(label_col, F.lit(v))
        out = tagged if out is None else out.unionByName(tagged)
    return out
