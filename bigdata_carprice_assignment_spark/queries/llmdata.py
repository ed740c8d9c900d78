"""LLM-data-pipeline queries over documents/embeddings (driver north
star). SQL-expressible reductions carry DuckDB oracles; the LSH/SimHash/
multimodal pipelines are rows-only with pytest correctness harnesses
(tests/test_llm.py) on synthetic corpora with known duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup as D
from ..llm import multimodal as MM
from ..llm import similarity as S
from ..llm import text as TX
from ..registry import query
from ..sources.readers import load_table

# --------------------------------------------------------------------------
# Text analysis (oracle-backed).
# --------------------------------------------------------------------------


@query(
    "doc_token_stats_by_lang",
    oracle=r"""
SELECT lang,
       count(*) AS n_docs,
       round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens,
       round(avg(length(text)), 4) AS avg_chars,
       max(len(string_split_regex(trim(text), '\s+'))) AS max_tokens
FROM documents GROUP BY lang ORDER BY lang
""",
)
def doc_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", TX.token_count("text").alias("tc"), F.length("text").alias("nc"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("tc"), 4).alias("avg_tokens"),
            F.round(F.avg("nc"), 4).alias("avg_chars"),
            F.max("tc").cast("long").alias("max_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "doc_quality_by_source",
    oracle=r"""
WITH f AS (
  SELECT source,
         length(text) AS n_chars,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(list_filter(string_split_regex(trim(text), '\s+'),
             t -> lower(t) IN ('the','and','of','to','a','in','is','for','with','on')))
           AS stop_hits,
         length(regexp_replace(text, '[a-zA-Z0-9_\s]', '', 'g')) AS punct_chars
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       round(avg(stop_hits / greatest(n_tokens, 1)), 6) AS avg_stopword_ratio,
       round(avg(punct_chars / greatest(n_chars, 1)), 6) AS avg_punct_ratio,
       round(avg(n_chars), 2) AS avg_chars
FROM f GROUP BY source ORDER BY source
""",
)
def doc_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = TX.quality_features("text")
    return (
        docs.select(
            "source",
            feats["n_chars"].alias("n_chars"),
            feats["stopword_ratio"].alias("sr"),
            feats["punct_ratio"].alias("pr"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("sr"), 6).alias("avg_stopword_ratio"),
            F.round(F.avg("pr"), 6).alias("avg_punct_ratio"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("source")
    )


@query(
    "doc_lang_id_agreement",
    oracle=r"""
WITH f AS (
  SELECT lang,
    len(list_filter(string_split_regex(trim(text), '\s+'), t -> lower(t) IN
        ('the','and','of','to','a','in','is','for','with','on')))::DOUBLE AS s_en,
    len(list_filter(string_split_regex(trim(text), '\s+'), t -> lower(t) IN
        ('el','la','de','que','y','en','un','una','los','por')))::DOUBLE AS s_es,
    len(list_filter(string_split_regex(trim(text), '\s+'), t -> lower(t) IN
        ('le','la','de','et','les','des','un','une','est','dans')))::DOUBLE AS s_fr,
    len(list_filter(string_split_regex(trim(text), '\s+'), t -> lower(t) IN
        ('der','die','das','und','ist','von','mit','den','ein','nicht')))::DOUBLE AS s_de,
    (length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}]', '', 'g')))::DOUBLE AS s_zh
  FROM documents
),
g AS (
  SELECT lang, greatest(s_de, s_en, s_es, s_fr, s_zh) AS best,
         s_de, s_en, s_es, s_fr, s_zh
  FROM f
)
SELECT lang,
       CASE WHEN best <= 0 THEN 'und'
            WHEN s_de = best THEN 'de'
            WHEN s_en = best THEN 'en'
            WHEN s_es = best THEN 'es'
            WHEN s_fr = best THEN 'fr'
            ELSE 'zh' END AS predicted,
       count(*) AS n
FROM g GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def doc_lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID vs the corpus's lang column: confusion counts
    (the stopword-evidence argmax ladder, replicated in the oracle with
    the same deterministic tie-break — language code ascending)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", TX.lang_id("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@query(
    "doc_fingerprint_stats",
    oracle="""
SELECT count(*) AS n_docs,
       count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9_\\s]', ' ', 'g'), '\\s+', ' ', 'g')))) AS n_distinct_normalized
FROM documents
""",
)
def doc_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup key cardinality (normalized md5 content hash)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(TX.content_hash("text")).alias("n_distinct_normalized"),
    )


# --------------------------------------------------------------------------
# Embedding similarity (oracle-backed brute force; LSH/IVF rows-only).
# --------------------------------------------------------------------------


@query(
    "embedding_norm_stats",
    oracle="""
SELECT label,
       count(*) AS n,
       round(avg(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS avg_l2_norm
FROM embeddings GROUP BY label ORDER BY label
""",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", S.l2_norm(F.col("embedding")).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 6).alias("avg_l2_norm"),
        )
        .orderBy("label")
    )


@query(
    "cosine_topk_vs_query",
    oracle="""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, q.qe),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
         sqrt(list_sum(list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
         sqrt(list_sum(list_transform(q.qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
  FROM embeddings e, q
)
SELECT vec_id, round(dot / (na * nb), 6) AS cosine
FROM s WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
)
def cosine_topk_vs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the vec_id=0 query vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return (
        S.cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qvec, k=10
        )
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
    )


@query("cosine_topk_lsh_vs_query")
def cosine_topk_lsh_vs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate (LSH) variant of the same probe — rows-only; recall vs
    the exact result asserted in tests/test_llm.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    hits = S.cosine_topk_lsh(
        emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qvec, k=10
    )
    return hits.select("vec_id", F.round("cosine", 6).alias("cosine"))


@query("ivf_topk_vs_query")
def ivf_topk_vs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse-quantized probe (scale path) — rows-only."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    model, assigned = S.ivf_index(emb, "embedding", n_cells=8)
    return (
        S.ivf_topk(model, assigned.filter(F.col("vec_id") != 0), "embedding", "vec_id", qvec, k=10, nprobe=3)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# Dedup pipelines (rows-only; synthetic-corpus correctness in tests).
# --------------------------------------------------------------------------


@query(
    "exact_dedup_documents",
    oracle="""
WITH h AS (
  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9_\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS digest
  FROM documents
)
SELECT count(*) AS n_docs,
       count(*) - count(DISTINCT digest) AS n_duplicates,
       count(DISTINCT digest) AS n_canonical
FROM h
""",
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flagged = D.exact_dedup(docs, "text", "doc_id")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_duplicate").cast("long")).alias("n_duplicates"),
        F.countDistinct("canonical_id").alias("n_canonical"),
    )


@query("minhash_near_dup_documents")
def minhash_near_dup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup summary over the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = D.minhash_dedup(docs, "text", "doc_id", threshold=0.6)
    return flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_duplicate").cast("long")).alias("n_near_duplicates"),
        F.countDistinct("canonical_id").alias("n_canonical"),
    )


@query("simhash_candidate_pairs")
def simhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding candidates with Hamming distance ≤ 12."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_candidates(docs, "text", "doc_id", band_bits=16)
    return (
        pairs.filter(F.col("hamming") <= 12)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


@query("ngram_jaccard_near_dups")
def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over MinHash candidates (candidate→verify)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "text", "doc_id")
    pairs = D.minhash_band_pairs(sigs, "doc_id")
    verified = D.jaccard_verify(docs, pairs, "text", "doc_id", threshold=0.5)
    return verified.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    )


@query("embedding_near_dup_pairs")
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH candidate + exact verify)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dups(emb, "embedding", "vec_id", threshold=0.9)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("cosine"), 6).alias("avg_cosine"),
    )


# --------------------------------------------------------------------------
# Approximate-pipeline recall oracles: the sketch→candidate→verify
# pipelines are checked against DuckDB brute-force ALL-PAIRS ground truth.
# These pass only when the approximate stage has perfect recall on the
# corpus (params chosen so the miss probability is ≈0, or — for SimHash
# banding — recall is GUARANTEED by pigeonhole), making them hard
# correctness gates on the whole pipeline, not just the verify step.
# --------------------------------------------------------------------------

# word-3-gram shingle sets, replicating llm/text.py::shingles (normalize →
# whitespace tokens → 3-gram join → distinct) in DuckDB list functions.
_DUCK_SHINGLES = r"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9_\s]', ' ', 'g'), '\s+', ' ', 'g')) AS t
  FROM documents
),
tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(toks[i:i+2], ' '))) AS grams
  FROM tk
)
"""


@query(
    "minhash_lsh_recall_pairs",
    oracle=_DUCK_SHINGLES
    + """
, pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.grams, b.grams))::DOUBLE
           / len(list_distinct(list_concat(a.grams, b.grams))) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT a, b, round(j, 6) AS jaccard
FROM pairs WHERE j >= 0.8 ORDER BY a, b
""",
)
def minhash_lsh_recall_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates → exact-Jaccard verify at t=0.8, checked
    against DuckDB brute-force all-pairs Jaccard. 64 hashes / 16 bands
    of 4 ⇒ per-pair miss probability (1−0.8⁴)¹⁶ ≈ 2·10⁻⁴ at the exact
    threshold (≤7·10⁻⁶ at the corpus's planted-pair similarities) while
    keeping the candidate set sparse — width-2 bands would admit ~all
    mid-similarity pairs and degenerate the banding into an all-pairs
    join. Verified equal to brute force on both test corpora; Jaccard
    is a ratio of integers in both engines, so threshold decisions and
    6dp rounding are bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "text", "doc_id", num_hashes=64)
    pairs = D.minhash_band_pairs(sigs, "doc_id", bands=16)
    verified = D.jaccard_verify(docs, pairs, "text", "doc_id", threshold=0.8)
    return verified.select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("a", "b")


@query(
    "simhash_hamming_pairs_exact",
    oracle=r"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9_\s]', ' ', 'g'), '\s+', ' ', 'g')) AS t
  FROM documents
),
tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
hs AS (
  SELECT doc_id,
         list_transform(toks, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hv
  FROM tk
),
fp AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, 60), b ->
             CASE WHEN list_sum(list_transform(hv, h ->
                 CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             THEN (1::BIGINT << b) ELSE 0 END)) AS sh
  FROM hs
)
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
ORDER BY a, b
""",
)
def simhash_hamming_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding checked against DuckDB brute-force all-pairs
    Hamming distance. Uses the md5-derived 60-bit token hash (identical
    in both engines) and 4 bands of 15 bits: by pigeonhole every pair
    within Hamming distance 3 shares a band, so the banded candidate set
    filtered to hamming≤3 IS the exact all-pairs answer — guaranteed
    recall, not probabilistic."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_candidates(
        docs, "text", "doc_id", band_bits=15, bits=60, token_hash="md5"
    )
    return (
        pairs.filter(F.col("hamming") <= 3)
        .select("a", "b", F.col("hamming").cast("long").alias("hamming"))
        .orderBy("a", "b")
    )


# The `embeddings` table is near-orthogonal noise (all-pairs max cosine
# ≈ 0.5 — measured): NO ANN method can honestly reproduce exact top-k
# over it, so the hard recall gates run over embeddings that carry real
# structure — the hashing-trick shingle histogram of the documents
# corpus (llm/text.py::hashed_shingle_features), where planted near-dup
# texts land at cosine ≥ 0.9 and unrelated texts stay ≤ ~0.73. The
# vectorizer is engine-portable (md5 bucket hash), so DuckDB computes
# the identical vectors and the brute-force all-pairs ground truth.
_DUCK_HASHED_FEATURES = r"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9_\s]', ' ', 'g'), '\s+', ' ', 'g')) AS t
  FROM documents
),
tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
shg AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(toks[i:i+2], ' '))) AS grams
  FROM tk
),
hv AS (
  SELECT doc_id,
         list_transform(grams,
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT & 63) AS hs
  FROM shg
),
f AS (
  SELECT doc_id,
         list_transform(range(0, 64),
             b -> len(list_filter(hs, h -> h = b))::DOUBLE) AS feat
  FROM hv
),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         list_sum(list_transform(list_zip(a.feat, b.feat), q -> q[1]*q[2]))
           / (sqrt(list_sum(list_transform(a.feat, x -> x*x)))
            * sqrt(list_sum(list_transform(b.feat, x -> x*x)))) AS c
  FROM f a JOIN f b ON a.doc_id < b.doc_id
)
"""


def _hashed_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    return TX.hashed_shingle_features_df(
        docs.repartition(n_parts, "doc_id"), "text", "doc_id"
    ).localCheckpoint()  # vectorize once; reused on both sides of joins


@query(
    "embedding_near_dup_recall",
    oracle=_DUCK_HASHED_FEATURES
    + """
SELECT a, b, round(c, 6) AS cosine
FROM p WHERE c >= 0.85 ORDER BY a, b
""",
)
def embedding_near_dup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pipeline (BRP-LSH candidates + exact double
    cosine verify) over hashed-shingle document embeddings, checked
    against DuckDB brute-force all-pairs cosine at t=0.85 — the planted
    near-dup pairs sit at ≥ 0.9 and noise tops out ≈ 0.73, so the LSH
    stage must reach perfect recall for the hash to match. The verify
    recomputes Σab/(‖a‖‖b‖) from the raw arrays with the same fold the
    oracle uses, so inclusion and 6dp rounding agree exactly."""
    feats = _hashed_doc_features(spark, sf_dir)
    pairs = D.embedding_near_dups(
        feats, "feat", "doc_id", threshold=0.85, num_hash_tables=4
    )
    return pairs.select("a", "b", F.round("cosine", 6).alias("cosine")).orderBy(
        "a", "b"
    )


_KNN_TOP1_ORACLE = _DUCK_HASHED_FEATURES + """
, sym AS (
  SELECT a AS doc_id, b AS nn, c FROM p WHERE c >= 0.85
  UNION ALL
  SELECT b AS doc_id, a AS nn, c FROM p WHERE c >= 0.85
),
r AS (
  SELECT doc_id, nn, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, nn ASC) AS rn
  FROM sym
)
SELECT doc_id, nn AS nn_id, round(c, 6) AS cosine
FROM r WHERE rn = 1 ORDER BY doc_id
"""


@query("lsh_knn_join_top1", oracle=_KNN_TOP1_ORACLE)
def lsh_knn_join_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH kNN-join recall gate: every document with a true ≥0.85-cosine
    partner must retrieve its best partner via the BRP-LSH similarity
    join — checked against DuckDB brute-force all-pairs top-1."""
    feats = _hashed_doc_features(spark, sf_dir)
    pairs = D.embedding_near_dups(
        feats, "feat", "doc_id", threshold=0.85, num_hash_tables=4
    )
    sym = pairs.select(
        F.col("a").alias("doc_id"), F.col("b").alias("nn"), F.col("cosine")
    ).unionByName(
        pairs.select(
            F.col("b").alias("doc_id"), F.col("a").alias("nn"), F.col("cosine")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("cosine"), F.asc("nn"))
    return (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id", F.col("nn").alias("nn_id"), F.round("cosine", 6).alias("cosine")
        )
        .orderBy("doc_id")
    )


@query("ivf_knn_join_top1", oracle=_KNN_TOP1_ORACLE)
def ivf_knn_join_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF batch kNN-join recall gate: probing the nprobe=4 of 8 nearest
    k-means cells per document must retrieve every true ≥0.85 partner
    (near-dup vectors land in nearby cells — real locality, verified on
    this corpus) — checked against the same brute-force top-1 oracle."""
    feats = _hashed_doc_features(spark, sf_dir)
    model, assigned = S.ivf_index(feats, "feat", n_cells=8)
    top1 = S.ivf_knn_join(model, assigned, "feat", "doc_id", k=1, nprobe=4)
    return (
        top1.filter(F.col("cosine") >= 0.85)
        .select("doc_id", "nn_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Training-data pipeline operators (oracle-backed): deterministic
# stratified sampling, context-window chunking, sequence packing,
# repetition-based quality filtering. All pure Column expressions built
# on the engine-portable md5 hash where a decision must replicate in
# DuckDB.
# --------------------------------------------------------------------------


@query(
    "stratified_sample_by_lang",
    oracle=r"""
WITH d AS (
  SELECT lang,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < (
             CASE lang WHEN 'en' THEN 3000 WHEN 'fr' THEN 8000 ELSE 10000 END
         ) AS keep
  FROM documents
)
SELECT lang,
       count(*) AS n_total,
       count(*) FILTER (keep) AS n_kept,
       coalesce(sum(n_tokens) FILTER (keep), 0) AS kept_tokens
FROM d GROUP BY lang ORDER BY lang
""",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling (rebalance a corpus by
    language: keep 30% of en, 80% of fr, all low-resource) — the
    keep-decision is a portable row hash, so it is reproducible across
    engines/retries/partitionings and DuckDB verifies the exact kept
    set, not just approximate rates."""
    docs = load_table(spark, sf_dir, "documents")
    frac = F.when(F.col("lang") == "en", F.lit(0.3)).when(
        F.col("lang") == "fr", F.lit(0.8)
    ).otherwise(F.lit(1.0))
    denom = 10_000
    keep = TX.portable_hash60(F.col("doc_id").cast("string")) % denom < F.round(
        frac * denom
    ).cast("long")
    return (
        docs.select("lang", TX.token_count("text").alias("nt"), keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("keep"), F.col("nt"))), F.lit(0)
            ).cast("long").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "doc_chunking_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents WHERE doc_id < 200
),
s AS (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48)) AS start
  FROM t
),
c AS (
  SELECT doc_id, len(toks[start:start+63]) AS chunk_tokens
  FROM s
)
SELECT doc_id,
       count(*) AS n_chunks,
       sum(chunk_tokens) AS sum_chunk_tokens,
       min(chunk_tokens) AS min_chunk_tokens
FROM c GROUP BY doc_id ORDER BY doc_id
""",
)
def doc_chunking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (64-token windows, 16-token overlap,
    every token covered; the training-data step between cleaning and
    packing) — explode shape, per-doc chunk accounting hash-checked
    against DuckDB's unnest+slice replica."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = TX.tokens("text")
    chunks = docs.select(
        "doc_id",
        tok.alias("toks"),
        F.explode(TX.chunk_starts(F.size(tok), 64, 16)).alias("start"),
    ).select(
        "doc_id",
        F.size(F.slice("toks", F.col("start"), 64)).cast("long").alias("chunk_tokens"),
    )
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").alias("sum_chunk_tokens"),
            F.min("chunk_tokens").alias("min_chunk_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "sequence_packing_stats",
    oracle=r"""
WITH d AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS shard,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
),
o AS (
  SELECT shard, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM d
)
SELECT shard,
       count(*) AS n_docs,
       count(DISTINCT off // 512) AS n_sequences,
       sum(n_tokens) AS total_tokens,
       round(sum(n_tokens)::DOUBLE / (count(DISTINCT off // 512) * 512), 6)
         AS utilization
FROM o GROUP BY shard ORDER BY shard
""",
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-then-chunk into 512-token training
    sequences): docs are hash-sharded, each shard packs independently in
    doc order — the scale shape (no global window; one partition per
    shard) — and a doc's sequence id is its running token offset ÷
    budget. n_sequences counts sequences where at least one doc starts
    (an over-budget doc spills past its sequence)."""
    from pyspark.sql import Window

    budget = 512
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        (TX.portable_hash60(F.col("doc_id").cast("string")) % 8).alias("shard"),
        TX.token_count("text").cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = d.withColumn("off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        o.withColumn("seq", F.floor(F.col("off") / budget))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("seq").alias("n_sequences"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_tokens") / (F.countDistinct("seq") * F.lit(budget)), 6
            ).alias("utilization"),
        )
        .orderBy("shard")
    )


@query(
    "eval_contamination_check",
    oracle=r"""
WITH nrm AS (
  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9_\s]', ' ', 'g'), '\s+', ' ', 'g')) AS t
  FROM documents
),
tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM nrm),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(toks) - 7, 1) + 1),
             i -> array_to_string(toks[i:i+7], ' '))) AS grams
  FROM tk
)
SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
       len(list_intersect(tr.grams, ev.grams))::BIGINT AS n_shared
FROM sh tr JOIN sh ev ON tr.doc_id >= 10 AND ev.doc_id < 10
WHERE len(list_intersect(tr.grams, ev.grams)) >= 3
ORDER BY train_id, eval_id
""",
)
def eval_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which training docs (doc_id ≥ 10)
    share ≥3 distinct word 8-grams with the held-out eval set
    (doc_id < 10)? Broadcast-join on the gram (the eval side is small by
    construction); checked against DuckDB's exact list-intersect."""
    docs = load_table(spark, sf_dir, "documents")
    hits = D.ngram_contamination(
        docs.filter(F.col("doc_id") >= 10),
        docs.filter(F.col("doc_id") < 10),
        "text",
        "doc_id",
        n=8,
        min_shared=3,
    )
    return hits.select(
        F.col("train_id"), F.col("eval_id"), F.col("n_shared").cast("long").alias("n_shared")
    ).orderBy("train_id", "eval_id")


@query(
    "keyword_search_tfidf",
    oracle=r"""
WITH tk AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9_\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents
),
tf AS (
  SELECT doc_id,
         count(*) FILTER (w = 'vector') AS tv,
         count(*) FILTER (w = 'join')   AS tj,
         count(*) FILTER (w = 'stream') AS ts
  FROM tk WHERE w IN ('vector', 'join', 'stream') GROUP BY doc_id
),
df AS (
  SELECT count(DISTINCT doc_id) FILTER (w = 'vector') AS dv,
         count(DISTINCT doc_id) FILTER (w = 'join')   AS dj,
         count(DISTINCT doc_id) FILTER (w = 'stream') AS ds
  FROM tk WHERE w IN ('vector', 'join', 'stream')
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id,
       round(tf.tv * ln((1.0 + n.n_docs) / (1.0 + df.dv))
           + tf.tj * ln((1.0 + n.n_docs) / (1.0 + df.dj))
           + tf.ts * ln((1.0 + n.n_docs) / (1.0 + df.ds)), 6) AS score
FROM tf, df, n
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
)
def keyword_search_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval: TF-IDF scoring (sklearn-style smoothed idf
    ln((1+N)/(1+df))) for a fixed 3-term query, top-10 docs. One
    explode→filter→aggregate pass computes per-doc term frequencies as
    FIXED columns so the score's floating-point addition order is
    identical in both engines (a grouped SUM over melted rows would add
    in nondeterministic order). Document frequencies are a broadcast
    1-row aggregate; ranking is TakeOrderedAndProject."""
    terms = ["vector", "join", "stream"]
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # one scalar to the driver
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    toks = (
        docs.repartition(n_parts, "doc_id")
        .select("doc_id", F.explode(TX.tokens(TX.normalize_text(F.col("text")))).alias("w"))
        .filter(F.col("w").isin(terms))
    )
    tf = toks.groupBy("doc_id").agg(
        *[
            F.sum((F.col("w") == t).cast("long")).alias(f"tf_{t}")
            for t in terms
        ]
    )
    dfreq = toks.groupBy().agg(
        *[
            F.count_distinct(F.when(F.col("w") == t, F.col("doc_id"))).alias(f"df_{t}")
            for t in terms
        ]
    )
    idf = {t: F.log((1.0 + n_docs) / (1.0 + F.col(f"df_{t}"))) for t in terms}
    score = sum(
        (F.col(f"tf_{t}") * idf[t] for t in terms[1:]),
        F.col(f"tf_{terms[0]}") * idf[terms[0]],
    )
    return (
        tf.crossJoin(F.broadcast(dfreq))
        .select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "doc_repetition_quality",
    oracle=r"""
WITH n AS (
  SELECT source,
         string_split(text, chr(10)) AS lines,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9_\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
g AS (
  SELECT source, lines,
         list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(toks[i:i+2], ' ')) AS grams
  FROM n
),
m AS (
  SELECT source,
         (len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines) AS dlr,
         (len(grams) - len(list_distinct(grams)))::DOUBLE / len(grams) AS dgr
  FROM g
)
SELECT source,
       count(*) AS n_docs,
       round(avg(dlr), 6) AS avg_dup_line_ratio,
       round(avg(dgr), 6) AS avg_dup_gram_ratio,
       count(*) FILTER (dgr > 0.2) AS n_flagged
FROM m GROUP BY source ORDER BY source
""",
)
def doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter (Gopher-style): duplicate-line
    and duplicate-3-gram ratios per source, plus how many docs a
    dup-gram >20% filter would drop. Integer-ratio doubles keep the
    threshold and rounding engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    docs = docs.repartition(n_parts, "doc_id")
    metrics = TX.repetition_metrics_df(docs, "text", "doc_id")
    return (
        docs.select("doc_id", "source")
        .join(metrics, "doc_id")
        .select(
            "source",
            F.col("dup_line_ratio").alias("dlr"),
            F.col("dup_gram_ratio").alias("dgr"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dlr"), 6).alias("avg_dup_line_ratio"),
            F.round(F.avg("dgr"), 6).alias("avg_dup_gram_ratio"),
            F.sum((F.col("dgr") > 0.2).cast("long")).alias("n_flagged"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Multimodal plumbing (rows-only; deterministic fake decode).
# --------------------------------------------------------------------------


@query(
    "multimodal_feature_extract",
    oracle="""
SELECT count(*) AS n_media,
       count(*) AS n_decoded,
       round(avg(octet_length(encode(text))), 2) AS avg_bytes,
       count(DISTINCT sha256(text)) AS n_distinct_payloads
FROM documents
""",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched mapInPandas
    (decode stubbed deterministically — no codecs in this container).
    The Python-side sha256/byte stats are hash-checked against DuckDB's
    native blob functions — the oracle proves the Arrow round trip is
    byte-exact."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    feats = MM.extract_features(media, decode="fake")
    return feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("decode_ok").cast("long")).alias("n_decoded"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        F.countDistinct("sha256").alias("n_distinct_payloads"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
WITH m AS (
  SELECT doc_id AS media_id,
         least(greatest(octet_length(encode(text)) // 64, 1), 16) AS n_frames
  FROM documents WHERE doc_id < 50
)
SELECT media_id, n_frames, (n_frames - 1) * 500 AS last_ts_ms
FROM m ORDER BY media_id
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling kernel: one row per sampled frame; per-media frame
    counts hash-checked against the closed-form count."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = MM.documents_as_media(docs)
    frames = MM.sample_frames(media, every_ms=500)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("ts_ms").alias("last_ts_ms"),
    ).orderBy("media_id")
