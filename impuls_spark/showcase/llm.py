"""LLM-data-pipeline operator showcase over documents/embeddings, each
with a DuckDB oracle (same md5-based hashing, double-precision math,
identical aliases). The operators themselves live in
``impuls_spark.llm``; these wrappers bind them to the harness tables.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup, sampling, similarity, text as txt
from ..llm.multimodal import attach_binary, decode_media


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fanned-out documents read for the CPU-heavy narrow pipelines
    (shingle/gram explodes, signature arithmetic). The harness parquet
    is a single row group, so the scan arrives as ONE split and a
    narrow pipeline runs on one core until its first exchange; one
    ~600 KB repartition up front buys every core — the split count a
    real multi-file 100 TB scan would give these plans natively.
    Deliberately NOT used by cheap one-shuffle aggregates (the extra
    exchange costs more than the parallelism buys) nor by mapInPandas
    queries (fewer, larger Arrow batches beat 32 cold Python workers);
    measured both ways, per query, in BENCH_PINNED history."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


#: per-session cache of shared intermediate frames, keyed by a WEAK
#: reference to the SparkSession: when a session is garbage-collected
#: its cached (persisted) plans drop with it, so a long-lived process
#: never leaks persisted blocks across sessions and a recycled ``id()``
#: can't alias a new session onto a stale plan.
_SESSION_CACHES: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _session_cache(spark: SparkSession) -> dict:
    cache = _SESSION_CACHES.get(spark)
    if cache is None:
        cache = {}
        _SESSION_CACHES[spark] = cache
    return cache


def _shingles_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded shingle frame — several text queries start from the same
    shingling pass; persisting it once is the multi-query analog of a
    materialized CTE."""
    cache = _session_cache(spark)
    key = ("shingles", sf_dir)
    if key not in cache:
        sh = dedup.word_shingles(_docs_wide(spark, sf_dir))
        cache[key] = sh.persist()
    return cache[key]


def _overlap_parts_cached(spark: SparkSession, sf_dir: str):
    """Measure-independent capped pair-overlap frame (max_df=20) —
    the cold-postings self-join is the single most expensive stage of
    BOTH the Jaccard (d02) and containment (d26) queries, and is
    identical between them; build it once per session, persist, and
    let each query apply its own threshold prune downstream."""
    cache = _session_cache(spark)
    key = ("overlap20", sf_dir)
    if key not in cache:
        pre, hotpost, built_max_df = dedup._overlap_parts(
            _shingles_cached(spark, sf_dir), "doc_id", max_df=20
        )
        cache[key] = (pre.persist(), hotpost.persist(), built_max_df)
    return cache[key]


def _emb_count_cached(spark: SparkSession, sf_dir: str) -> int:
    """Row count of the embeddings table (parquet metadata read) —
    drives the size-scaled index granularity below."""
    cache = _session_cache(spark)
    key = ("emb_count", sf_dir)
    if key not in cache:
        cache[key] = _emb(spark, sf_dir).count()
    return cache[key]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain read: the embedding table is small enough that the Lloyd
    # loops' per-stage task overhead dominates any fan-out gain
    # (measured: d37/d42 regressed ~1s under a 32-way repartition)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# d01 — exact dedup (hash-groupBy) on a simulated re-crawl
# ---------------------------------------------------------------------------

def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    recrawl = docs.withColumn("doc_id", F.col("doc_id") + 1000000)
    return dedup.exact_duplicate_groups(docs.unionByName(recrawl))


D01_SQL = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents
)
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_id,
       count(*) - 1 AS n_dupes
FROM all_docs GROUP BY 1 HAVING count(*) - 1 > 0
"""

_SHINGLES_SQL = """
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(words) - 1, 1)),
         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
"""


# ---------------------------------------------------------------------------
# d02 — n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------

def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_df caps the inverted-list fan-out: a shingle in k docs emits
    # k² candidate rows, so stop-word shingles make the uncapped join
    # quadratic on web text. Verification stays exact over full sets;
    # the oracle below applies the identical cap.
    return dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.2,
        shingles=_shingles_cached(spark, sf_dir),
        max_df=20,
        parts=_overlap_parts_cached(spark, sf_dir),
    )


D02_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cold AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 20
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM (SELECT s.doc_id, s.shingle FROM sh s JOIN cold USING (shingle)) a
  JOIN (SELECT s.doc_id, s.shingle FROM sh s JOIN cold USING (shingle)) b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.2
"""


# ---------------------------------------------------------------------------
# d03 — MinHash + LSH candidate pairs
# ---------------------------------------------------------------------------

def _signatures_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus MinHash signatures (6 hashes over the shared shingle
    pass) — consumed by the d03 pair graph AND d35's corpus-side band
    table; computed and persisted once per session."""
    cache = _session_cache(spark)
    key = ("minhash_sigs", sf_dir)
    if key not in cache:
        cache[key] = dedup.minhash_signatures(
            _docs(spark, sf_dir), n_hashes=6,
            shingles=_shingles_cached(spark, sf_dir),
        ).persist()
    return cache[key]


def _lsh_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d03 LSH pair graph feeds three queries (d03, d14's connected
    components, d29's contamination audit) — persisted once per session
    via the same weak-keyed cache as the shingles."""
    cache = _session_cache(spark)
    key = ("lsh_pairs", sf_dir)
    if key not in cache:
        cache[key] = dedup.lsh_candidate_pairs(
            _docs(spark, sf_dir), n_hashes=6, band_size=2,
            signatures=_signatures_cached(spark, sf_dir),
        ).persist()
    return cache[key]


def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs_cached(spark, sf_dir)


D03_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
seeded AS (
  SELECT doc_id, seed, md5(seed::varchar || chr(31) || shingle) AS h
  FROM sh, (SELECT unnest(range(6)) AS seed)
),
sig AS (
  SELECT doc_id,
         min(CASE WHEN seed = 0 THEN h END) AS h0,
         min(CASE WHEN seed = 1 THEN h END) AS h1,
         min(CASE WHEN seed = 2 THEN h END) AS h2,
         min(CASE WHEN seed = 3 THEN h END) AS h3,
         min(CASE WHEN seed = 4 THEN h END) AS h4,
         min(CASE WHEN seed = 5 THEN h END) AS h5
  FROM seeded GROUP BY doc_id
),
bands AS (
  SELECT doc_id, 0 AS band, h0 || chr(31) || h1 AS key FROM sig
  UNION ALL SELECT doc_id, 1, h2 || chr(31) || h3 FROM sig
  UNION ALL SELECT doc_id, 2, h4 || chr(31) || h5 FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# d04 — SimHash near duplicates
# ---------------------------------------------------------------------------

def _docs_count_cached(spark: SparkSession, sf_dir: str) -> int:
    cache = _session_cache(spark)
    key = ("docs_count", sf_dir)
    if key not in cache:
        cache[key] = _docs(spark, sf_dir).count()
    return cache[key]


def d04_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist the (id, simhash) table: the pair query consumes it in
    # three plan branches, and it is tiny (id + a few bytes per doc).
    # Signature width scales with the corpus: the 16-bit value space
    # saturates once distinct signatures approach 2^16 (chunk buckets
    # then go quadratic in the VALUE pair space), so past ~100k docs
    # the showcase switches to the Manku-style wider signature with
    # 8-bit chunk blocking. Below that the measured cost is the
    # signature build itself (linear — sf1 profiling, r6: 50k docs
    # yield only 4.3k distinct 16-bit sigs, pair space tiny).
    bits = 16 if _docs_count_cached(spark, sf_dir) <= 100_000 else 32
    cache = _session_cache(spark)
    key = ("simhash", sf_dir, bits)
    if key not in cache:
        cache[key] = dedup.simhash(
            _docs_wide(spark, sf_dir), bits=bits).persist()
    return dedup.simhash_near_duplicates(
        _docs(spark, sf_dir), bits=bits, max_hamming=3, sig=cache[key]
    )


def _simhash_votes_sql() -> str:
    votes = ",\n         ".join(
        f"sum((ascii(substr(md5(tok), {j + 1}, 1)) % 2) * 2 - 1) AS v{j}"
        for j in range(16)
    )
    bits = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
    )
    return f"""
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
votes AS (
  SELECT doc_id,
         {votes}
  FROM toks GROUP BY doc_id
),
sig AS (SELECT doc_id, ({bits})::bigint AS simhash FROM votes)
"""


# oracle does the exact pairwise check; the Spark side uses pigeonhole
# chunk blocking, which is lossless for hamming <= 3 over 4 chunks
D04_SQL = f"""
WITH {_simhash_votes_sql()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# d05 — brute-force cosine top-k
# ---------------------------------------------------------------------------

_COS_SQL = """
  round(
    list_sum(list_transform(range(1, 65), i -> q.embedding[i]::double * v.embedding[i]::double))
    / (sqrt(list_sum(list_transform(range(1, 65), i -> q.embedding[i]::double * q.embedding[i]::double)))
       * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::double * v.embedding[i]::double)))),
    6)
"""


def d05_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.brute_force_topk(emb, queries, k=3)


D05_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM embeddings q JOIN embeddings v ON q.vec_id != v.vec_id
  WHERE q.vec_id < 20
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# d06 — LSH-bucketed approximate top-k
# ---------------------------------------------------------------------------

def d06_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.lsh_topk(emb, queries, k=3)


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{d + 1}]::double > 0.0 THEN {1 << i} ELSE 0 END)"
    for i, d in enumerate(range(8))
)

D06_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, ({_BUCKET_SQL})::int AS bucket FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM bucketed q JOIN bucketed v
    ON q.bucket = v.bucket AND q.vec_id != v.vec_id
  WHERE q.vec_id < 20
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# d07 — language identification (stopword heuristic)
# ---------------------------------------------------------------------------

def d07_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pred = txt.language_id(docs)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def _langid_sql() -> str:
    hits = []
    for lang, sw in sorted(txt.DEFAULT_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in sw)
        hits.append(
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({lst}))) AS hits_{lang}"
        )
    langs = sorted(txt.DEFAULT_STOPWORDS)
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    chain = "CASE " + " ".join(
        f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
scored AS (SELECT doc_id, lang, {', '.join(hits)} FROM documents),
pred AS (SELECT doc_id, lang, {chain} AS predicted_lang FROM scored)
"""


D07_SQL = f"""
WITH {_langid_sql()}
SELECT lang, predicted_lang, count(*) AS n_docs
FROM pred GROUP BY lang, predicted_lang
"""


# ---------------------------------------------------------------------------
# d08 — quality scoring
# ---------------------------------------------------------------------------

def d08_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.quality_scores(_docs(spark, sf_dir))


_EN_STOP = ", ".join(f"'{w}'" for w in txt.DEFAULT_STOPWORDS["en"])

D08_SQL = f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '),
                         w -> lower(w) IN ({_EN_STOP}))) AS n_stop,
         length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_alnum
  FROM documents
),
parts AS (
  SELECT doc_id, n_chars, n_words,
         round((n_chars - (n_words - 1)) / n_words, 6) AS mean_word_len,
         round(n_stop / n_words, 6) AS stopword_ratio,
         round(n_alnum / n_chars, 6) AS alnum_ratio
  FROM base
)
SELECT doc_id, n_chars, n_words, mean_word_len, stopword_ratio, alnum_ratio,
       round(
         (CASE WHEN n_words >= 5 AND n_words <= 100000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN mean_word_len >= 2 AND mean_word_len <= 12 THEN 0.3 ELSE 0.0 END)
         + least(stopword_ratio * 2, 0.2)
         + alnum_ratio * 0.1,
       6) AS quality_score
FROM parts
"""


# ---------------------------------------------------------------------------
# d09 — token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

def d09_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.token_counts(_docs(spark, sf_dir))


D09_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(text, '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# d10 — min-k document fingerprint
# ---------------------------------------------------------------------------

def d10_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.fingerprints(
        _docs(spark, sf_dir), k=3, shingles=_shingles_cached(spark, sf_dir)
    )


D10_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL}))
SELECT doc_id,
       array_to_string(list_slice(list_sort(list(DISTINCT md5(shingle))), 1, 3), '|')
         AS fingerprint
FROM sh GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# d11 — multimodal decode plumbing (fake codec; metadata verified)
# ---------------------------------------------------------------------------

def d11_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    media = attach_binary(docs, payload_col="text", id_col="doc_id")
    return decode_media(media, codec="fake").select(
        "media_id", "n_bytes", "width", "height", "duration_ms", "checksum"
    )


D11_SQL = """
SELECT doc_id AS media_id,
       length(text)::bigint AS n_bytes,
       16 + ascii(substr(text, 1, 1)) AS width,
       16 + ascii(substr(text, -1, 1)) AS height,
       (length(text) * 10)::bigint AS duration_ms,
       md5(text) AS checksum
FROM documents
"""


# ---------------------------------------------------------------------------
# d12 — IVF (coarse-quantizer) approximate top-k
# ---------------------------------------------------------------------------

def d12_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ivf_topk(emb, queries, anchors, k=3)


D12_SQL = f"""
WITH anchors AS (SELECT vec_id AS anchor_id, embedding FROM embeddings WHERE vec_id < 4),
assign AS (
  SELECT vec_id, anchor_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, anchor_id) AS rn
  FROM (
    SELECT v.vec_id, a.anchor_id,
           round(
             list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * v.embedding[i]::double))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * a.embedding[i]::double)))
                * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::double * v.embedding[i]::double)))),
           6) AS sim
    FROM embeddings v CROSS JOIN anchors a
  )
),
cells AS (SELECT vec_id, anchor_id FROM assign WHERE rn = 1),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM embeddings q
  JOIN cells qc ON qc.vec_id = q.vec_id
  JOIN cells vc ON vc.anchor_id = qc.anchor_id
  JOIN embeddings v ON v.vec_id = vc.vec_id AND v.vec_id != q.vec_id
  WHERE q.vec_id < 20
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# d13 — embedding-cosine near-duplicate pairs (LSH-blocked)
# ---------------------------------------------------------------------------

def d13_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the synthetic embeddings are near-orthogonal (max pairwise cosine
    # ~0.51); 0.35 exercises the operator with a non-trivial result set.
    # Plane count scales with the corpus so sign-bucket occupancy stays
    # bounded (~16 vectors): FIXED planes make the bucket self-join
    # quadratic — measured 23x wall at 10x rows before this (sf1 run,
    # r6). 8 planes at the oracle sizes (<= 4096 vectors — identical
    # output to the pinned hash), 11 at sf1.
    import math

    n = _emb_count_cached(spark, sf_dir)
    p = max(8, math.ceil(math.log2(max(n, 16) / 16)))
    return similarity.embedding_near_duplicates(
        _emb(spark, sf_dir), threshold=0.35, plane_dims=range(p)
    )


D13_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, ({_BUCKET_SQL})::int AS bucket FROM embeddings
)
SELECT q.vec_id AS id_a, v.vec_id AS id_b, {_COS_SQL} AS cosine
FROM bucketed q JOIN bucketed v
  ON q.bucket = v.bucket AND q.vec_id < v.vec_id
WHERE {_COS_SQL} >= 0.35
"""


# ---------------------------------------------------------------------------
# d14 — duplicate clusters: connected components over the MinHash-LSH
# pair graph (transitive closure -> one canonical doc per dup group)
# ---------------------------------------------------------------------------

def d14_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.duplicate_clusters(d03_minhash_lsh(spark, sf_dir))


# DuckDB twin: recursive CTE min-label reachability over the same pair
# graph the Spark side propagates labels on
D14_SQL = f"""
WITH RECURSIVE pairs AS ({D03_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# d15 — deterministic stratified sampling (training-mixture primitive)
# ---------------------------------------------------------------------------

_D15_RATES = {"en": 0.3, "zh": 0.75, "es": 0.75, "de": 0.75}
_D15_DEFAULT = 0.9  # exercised by 'fr', deliberately unlisted


def d15_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.hash_stratified_sample(
        _docs(spark, sf_dir),
        rates=_D15_RATES,
        strata_col="lang",
        key_col="doc_id",
        default_rate=_D15_DEFAULT,
    ).select("doc_id", "lang", "source")


def _d15_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN '{sampling.rate_to_hex_threshold(rate)}'"
        for lang, rate in sorted(_D15_RATES.items())
    )
    default = sampling.rate_to_hex_threshold(_D15_DEFAULT)
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE substr(md5('sample' || ':' || lang || '|' || doc_id), 1, 8)
      < CASE lang {cases} ELSE '{default}' END
"""


D15_SQL = _d15_sql()


# ---------------------------------------------------------------------------
# d16 — vocabulary document/collection frequency (curation stats)
# ---------------------------------------------------------------------------

def d16_vocab_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.vocabulary_df(_docs(spark, sf_dir), top_n=20)


D16_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, count(DISTINCT doc_id) AS doc_freq, count(*) AS coll_freq
FROM toks WHERE token <> ''
GROUP BY token ORDER BY doc_freq DESC, token LIMIT 20
"""


# ---------------------------------------------------------------------------
# d17 — contiguous sequence packing (fixed-token-budget training bins)
# ---------------------------------------------------------------------------

def d17_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.packing import pack_sequences
    from ..llm.text import token_counts

    docs = _docs(spark, sf_dir)
    toks = token_counts(docs).select(
        "doc_id", F.col("n_ws_tokens").alias("n_tokens")
    )
    return pack_sequences(
        docs.select("doc_id", "lang").join(toks, "doc_id"),
        token_budget=512,
    )


D17_SQL = """
WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang AS shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM toks
)
SELECT doc_id, shard,
       (start // 512)::bigint AS bin_ix,
       (start % 512)::bigint AS offset,
       n_tokens::bigint AS n_tokens,
       (start % 512) + n_tokens > 512 AS overflow
FROM cum
"""


# ---------------------------------------------------------------------------
# d18 — benchmark decontamination (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

def d18_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import decontaminate

    docs = _docs(spark, sf_dir)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    tr_sh = _shingles_cached(spark, sf_dir).filter(F.col("doc_id") % 97 != 0)
    return decontaminate(
        train, eval_df, min_overlap=3, train_shingles=tr_sh
    ).orderBy("doc_id")


D18_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
SELECT tr.doc_id AS doc_id, count(*) AS n_overlap
FROM tr JOIN ev USING (shingle)
GROUP BY 1 HAVING count(*) >= 3
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# d19 — PII scan + redaction (emails / phones / IPs injected
# deterministically so the detector has real work at every SF)
# ---------------------------------------------------------------------------

def d19_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import pii_scan

    d = F.col("doc_id")
    aug = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" mail user"),
                    d.cast("string"),
                    F.lit("@mail.example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" call +1-202-"),
                    F.lpad((d % 9000 + 1000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 11 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (d % 256).cast("string"),
                    F.lit("."),
                    (d % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text2"),
    )
    out = pii_scan(aug, text_col="text2")
    return out.select(
        "doc_id",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_phones").cast("long").alias("n_phones"),
        F.col("n_ips").cast("long").alias("n_ips"),
        "redacted",
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+\d[\d-]{6,14}\d"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

D19_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' mail user' || doc_id::varchar || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +1-202-' || lpad((doc_id % 9000 + 1000)::varchar, 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' from 10.0.' || (doc_id % 256)::varchar || '.' || (doc_id % 100)::varchar
                 ELSE '' END AS text2
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text2, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text2, '{_PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(text2, '{_PII_IP}')) AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(text2, '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_IP}', '[IP]', 'g'),
         '{_PII_PHONE}', '[PHONE]', 'g') AS redacted
FROM aug
"""


# ---------------------------------------------------------------------------
# d20 — Gopher/C4-style quality filter rules
# ---------------------------------------------------------------------------

def d20_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import quality_rules

    return quality_rules(_docs(spark, sf_dir))


D20_SQL = """
WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS words, len(text) AS n_chars
  FROM documents
),
g AS (
  SELECT *, list_transform(range(1, len(words)),
                           i -> words[i] || ' ' || words[i+1]) AS grams
  FROM w
),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         round((n_chars - (len(words) - 1)) / len(words)::double, 6) AS mean_word_len,
         round(len(list_distinct(words)) / len(words)::double, 6) AS unique_word_frac,
         CASE WHEN len(grams) = 0 THEN 0.0
              ELSE round(1.0 - len(list_distinct(grams)) / len(grams)::double, 6)
         END AS repeated_2gram_frac,
         round((n_chars - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
               / n_chars::double, 6) AS symbol_frac
  FROM g
)
SELECT doc_id, n_words, mean_word_len, unique_word_frac, repeated_2gram_frac,
       symbol_frac,
       (n_words >= 20 AND n_words <= 100000
        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
        AND unique_word_frac >= 0.1
        AND repeated_2gram_frac <= 0.95
        AND symbol_frac <= 0.2) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# d21 — URL canonicalization + keep-best dedup (urls synthesized
# deterministically from source/doc_id so both engines see one page
# under many tracking-parameter variants)
# ---------------------------------------------------------------------------

def d21_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import url_dedup

    d = F.col("doc_id")
    with_url = _docs(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("https://WWW."),
            F.col("source"),
            F.lit(".Example.com/page/"),
            (d % 40).cast("string"),
            F.lit("/?utm_source=feed&ref="),
            (d % 3).cast("string"),
            F.lit("&id="),
            (d % 17).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    return url_dedup(with_url, quality_col="n_chars")


D21_SQL = """
WITH u AS (
  SELECT doc_id, n_chars,
         lower('https://WWW.' || source || '.Example.com/page/'
               || (doc_id % 40)::varchar || '/?utm_source=feed&ref='
               || (doc_id % 3)::varchar || '&id='
               || (doc_id % 17)::varchar || '#frag') AS url
  FROM documents
),
c AS (
  SELECT doc_id, n_chars,
         regexp_replace(regexp_replace(regexp_replace(url,
           '#.*$', ''), '^[a-z][a-z0-9+.-]*://', ''), '^www\\.', '') AS bare
  FROM u
),
p AS (
  SELECT doc_id, n_chars,
         regexp_replace(split_part(bare, '?', 1), '/$', '') AS path,
         CASE WHEN contains(bare, '?') THEN split_part(bare, '?', 2) ELSE '' END AS q
  FROM c
),
k AS (
  SELECT doc_id, n_chars, path,
         array_to_string(list_sort(list_filter(string_split(q, '&'),
           x -> x <> '' AND NOT regexp_matches(x,
                '^(utm_[a-z]+|ref|fbclid|gclid|mc_cid|mc_eid)='))), '&') AS qs
  FROM p
)
SELECT CASE WHEN qs <> '' THEN path || '?' || qs ELSE path END AS canonical_url,
       min(doc_id) AS canonical_id,
       count(*) - 1 AS n_dupes,
       max(n_chars) AS best_quality
FROM k
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# d22 — BM25 full-text ranking ("dup" is the rare/high-idf term in the
# synthetic vocabulary, so the ranking exercises the idf weighting)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("dup", "spark", "merge")


def d22_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.search import bm25_rank

    return bm25_rank(_docs(spark, sf_dir), _BM25_TERMS, top_k=20)


def _bm25_sql() -> str:
    tf = [
        f"len(list_filter(words, w -> w = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    ]
    dfs = [
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    ]
    contrib = " + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * tf{i} * 2.2 / (tf{i} + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH t AS (
  SELECT doc_id, len(words) AS dl, {", ".join(tf)}
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
),
s AS (SELECT count(*) AS n, avg(dl) AS avgdl, {", ".join(dfs)} FROM t),
raw AS (
  SELECT doc_id, round({contrib}, 6) AS score
  FROM t CROSS JOIN s
)
SELECT doc_id, score FROM raw
WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 20
"""


D22_SQL = _bm25_sql()



# ---------------------------------------------------------------------------
# d23 — tf-idf keyword extraction (top-3 per document)
# ---------------------------------------------------------------------------

def d23_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.tfidf_keywords(_docs(spark, sf_dir), k=3).withColumn(
        "rank", F.col("rank").cast("long")
    )


D23_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
t AS (
  SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> ''
  GROUP BY 1, 2
),
d AS (SELECT token, count(*) AS df FROM t GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT doc_id, token, round(tf * ln(n / df::double), 6) AS tfidf
  FROM t JOIN d USING (token) CROSS JOIN n
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS rank
  FROM s
)
SELECT doc_id, token, tfidf, rank FROM r WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# d24 — self-trained bigram LM fluency score (CCNet-style quality signal)
# ---------------------------------------------------------------------------

def d24_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the (id, w1, w2) occurrence stream feeds both the model aggregate
    # and the scoring join — persist it once so the text explode (the
    # dominant cost; it was re-derived per consumer before r5) runs once
    cache = _session_cache(spark)
    key = ("bigrams", sf_dir)
    if key not in cache:
        cache[key] = txt.bigram_pairs(_docs_wide(spark, sf_dir)).persist()
    return txt.bigram_lm_scores(_docs_wide(spark, sf_dir), grams=cache[key])


D24_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words)), i -> words[i])) AS w1,
         unnest(list_transform(range(1, len(words)), i -> words[i+1])) AS w2
  FROM w
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM g GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM g GROUP BY 1)
SELECT g.doc_id, count(*) AS n_bigrams,
       round(avg(ln(c2 / c1::double)), 6) AS lm_score
FROM g JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# d25 — deterministic train/valid/test split + per-split mixture stats
# ---------------------------------------------------------------------------

_D25_WEIGHTS = {"train": 0.9, "valid": 0.05, "test": 0.05}


def d25_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sampling.hash_split(_docs(spark, sf_dir), weights=_D25_WEIGHTS)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _d25_sql() -> str:
    t_train = sampling.rate_to_hex_threshold(_D25_WEIGHTS["train"])
    t_valid = sampling.rate_to_hex_threshold(
        _D25_WEIGHTS["train"] + _D25_WEIGHTS["valid"]
    )
    return f"""
WITH b AS (
  SELECT lang, n_chars,
         substr(md5('split' || ':' || doc_id::varchar), 1, 8) AS bucket
  FROM documents
),
s AS (
  SELECT lang, n_chars,
         CASE WHEN bucket < '{t_train}' THEN 'train'
              WHEN bucket < '{t_valid}' THEN 'valid'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, lang, count(*) AS n_docs, sum(n_chars)::bigint AS total_chars
FROM s GROUP BY 1, 2
"""


D25_SQL = _d25_sql()


# ---------------------------------------------------------------------------
# d26 — asymmetric containment near-dup (quoted-core / boilerplate-wrap
# duplication that Jaccard misses); same max_df candidate cap as d02
# ---------------------------------------------------------------------------

def d26_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.containment_pairs(
        _docs(spark, sf_dir), threshold=0.4,
        shingles=_shingles_cached(spark, sf_dir),
        max_df=20,
        parts=_overlap_parts_cached(spark, sf_dir),
    )


D26_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cold AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 20
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM (SELECT s.doc_id, s.shingle FROM sh s JOIN cold USING (shingle)) a
  JOIN (SELECT s.doc_id, s.shingle FROM sh s JOIN cold USING (shingle)) b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
sized AS (
  SELECT id_a, id_b, i, sa.sz AS sa, sb.sz AS sb
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
bth AS (
  SELECT id_a AS contained_id, id_b AS container_id,
         round(i / sa::double, 6) AS containment FROM sized
  UNION ALL
  SELECT id_b, id_a, round(i / sb::double, 6) FROM sized
)
SELECT * FROM bth WHERE containment >= 0.4
"""


# ---------------------------------------------------------------------------
# d27 — per-group embedding centroid + semantic outlier distance
# ---------------------------------------------------------------------------

def d27_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.centroid_outliers(
        _emb(spark, sf_dir), group_col="label", id_col="vec_id"
    )


D27_SQL = """
WITH comp AS (
  SELECT label,
         unnest(range(1, len(embedding) + 1)) AS pos,
         unnest(list_transform(embedding, x -> x::double)) AS x
  FROM embeddings
),
m AS (SELECT label, pos, avg(x) AS m FROM comp GROUP BY 1, 2),
cent AS (SELECT label, list(m ORDER BY pos) AS c FROM m GROUP BY 1)
SELECT e.vec_id, e.label,
  round(
    list_sum(list_transform(range(1, 65), i -> e.embedding[i]::double * c[i]))
    / (sqrt(list_sum(list_transform(range(1, 65),
            i -> e.embedding[i]::double * e.embedding[i]::double)))
       * sqrt(list_sum(list_transform(range(1, 65), i -> c[i] * c[i])))),
    6) AS centroid_cosine
FROM embeddings e JOIN cent USING (label)
"""



# ---------------------------------------------------------------------------
# d28 — per-source char-budget selection, BOTH variants (exact
# cumulative-sum rank, and the bucket-granular two-pass hash-threshold
# scale path with zero row-level sorts) — consolidated from the former
# d28/d31 twins (VERDICT r8 item 3)
# ---------------------------------------------------------------------------

_D28_BUDGET = 3000


def d28_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    exact = sampling.select_by_budget(
        docs, budget=_D28_BUDGET, weight_col="n_chars", strata_col="source",
    ).select(
        F.lit("exact_cumsum").alias("method"), "doc_id", "source", "n_chars"
    )
    thresh = sampling.select_by_budget_threshold(
        docs, budget=_D28_BUDGET, weight_col="n_chars", strata_col="source",
    ).select(
        F.lit("hash_threshold").alias("method"), "doc_id", "source",
        "n_chars",
    )
    return exact.unionByName(thresh)


D28_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY substr(md5('budget' || ':' || doc_id::varchar), 1, 8),
                    doc_id
           ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (
           PARTITION BY source
           ORDER BY substr(md5('budget' || ':' || doc_id::varchar), 1, 8),
                    doc_id) AS rn
  FROM documents
),
b AS (
  SELECT doc_id, source, n_chars,
         substr(md5('budget' || ':' || doc_id::varchar), 1, 3) AS bk
  FROM documents
),
pb AS (SELECT source, bk, sum(n_chars) AS w FROM b GROUP BY 1, 2),
c AS (
  SELECT source, bk,
         sum(w) OVER (PARTITION BY source ORDER BY bk
                      ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (PARTITION BY source ORDER BY bk) AS rn
  FROM pb
),
keep AS (SELECT source, bk FROM c WHERE cum <= {_D28_BUDGET} OR rn = 1)
SELECT 'exact_cumsum' AS method, doc_id, source, n_chars FROM ranked
WHERE cum <= {_D28_BUDGET} OR rn = 1
UNION ALL
SELECT 'hash_threshold', doc_id, source, n_chars
FROM b JOIN keep USING (source, bk)
"""


# ---------------------------------------------------------------------------
# d29 — cross-split contamination audit (near-dup pairs that straddle
# the train/eval boundary; composes d03's LSH pairs with d25's split)
# ---------------------------------------------------------------------------

def d29_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import cross_split_contamination

    docs = _docs(spark, sf_dir)
    pairs = _lsh_pairs_cached(spark, sf_dir)
    return cross_split_contamination(docs, pairs, weights=_D25_WEIGHTS)


def _d29_sql() -> str:
    t_train = sampling.rate_to_hex_threshold(_D25_WEIGHTS["train"])
    t_valid = sampling.rate_to_hex_threshold(
        _D25_WEIGHTS["train"] + _D25_WEIGHTS["valid"]
    )
    return f"""
WITH pairs AS ({D03_SQL}),
lbl AS (
  SELECT doc_id,
         CASE WHEN b < '{t_train}' THEN 'train'
              WHEN b < '{t_valid}' THEN 'valid'
              ELSE 'test' END AS split
  FROM (SELECT doc_id,
               substr(md5('split' || ':' || doc_id::varchar), 1, 8) AS b
        FROM documents)
),
tagged AS (
  SELECT p.id_a, p.id_b, la.split AS sa, lb.split AS sb
  FROM pairs p
  JOIN lbl la ON la.doc_id = p.id_a
  JOIN lbl lb ON lb.doc_id = p.id_b
)
SELECT id_a AS train_id, id_b AS eval_id, sb AS eval_split
FROM tagged WHERE sa = 'train' AND sb <> 'train'
UNION ALL
SELECT id_b, id_a, sa FROM tagged WHERE sb = 'train' AND sa <> 'train'
"""


D29_SQL = _d29_sql()


# ---------------------------------------------------------------------------
# d30 — temperature-flattened sampling mixture (T5/mT5 alpha-rebalance)
# ---------------------------------------------------------------------------

def d30_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.mixture_rates(_docs(spark, sf_dir), alpha=0.3)


D30_SQL = """
WITH c AS (SELECT source, count(*) AS n_rows FROM documents GROUP BY 1),
t AS (SELECT sum(pow(n_rows, 0.3)) AS z, sum(n_rows) AS total FROM c)
SELECT source, n_rows,
       round(pow(n_rows, 0.3) / z, 6) AS p,
       round(least(1.0, total * (pow(n_rows, 0.3) / z) / n_rows), 6) AS rate
FROM c CROSS JOIN t
"""



# ---------------------------------------------------------------------------
# d32 — within-document repetition (Gopher-style quality rules)
# ---------------------------------------------------------------------------

def d32_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.repetition_rates(_docs_wide(spark, sf_dir).select("doc_id", "text"))


D32_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents
),
b AS (
  SELECT doc_id, words, len(words) AS n,
         [words[i] || ' ' || words[i+1] for i in range(1, len(words))] AS bigrams
  FROM w
)
SELECT doc_id,
       CAST(n AS INT) AS n_words,
       CASE WHEN n > 0
            THEN round((n - len(list_distinct(words))) / CAST(n AS DOUBLE), 6)
            ELSE 0.0 END AS dup_word_frac,
       CASE WHEN n > 0
            THEN round(list_max(list_transform(list_distinct(words),
                     w -> len(list_filter(words, x -> x = w))))
                 / CAST(n AS DOUBLE), 6)
            ELSE 0.0 END AS top_word_frac,
       CASE WHEN len(bigrams) > 0
            THEN round((len(bigrams) - len(list_distinct(bigrams)))
                 / CAST(len(bigrams) AS DOUBLE), 6)
            ELSE 0.0 END AS dup_bigram_frac
FROM b
"""


# ---------------------------------------------------------------------------
# d33 — n-gram novelty vs earlier documents (marginal-data-value signal)
# ---------------------------------------------------------------------------

def d33_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.ngram_novelty(_docs_wide(spark, sf_dir).select("doc_id", "text"))


D33_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents
),
g0 AS (
  SELECT doc_id,
         UNNEST([array_to_string(words[i:i+2], ' ')
                 for i in range(1, len(words) - 1)]) AS gram
  FROM w WHERE len(words) >= 3
),
g AS (SELECT DISTINCT doc_id, gram FROM g0),
f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
SELECT g.doc_id,
       count(*) AS n_grams,
       round(avg(CASE WHEN f.first_doc = g.doc_id THEN 1.0 ELSE 0.0 END), 6)
           AS novelty
FROM g JOIN f USING (gram)
GROUP BY g.doc_id
"""



# ---------------------------------------------------------------------------
# d34 — JSONL corpus roundtrip (sink -> source, corrupt-line quarantine)
# ---------------------------------------------------------------------------

def d34_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes the documents table as gzip JSONL shards through the real
    sink, injects one valid and two corrupt lines, and re-reads through
    the quarantining source — the oracle checks per-source stats of the
    good rows AND the quarantine count, so the split itself is under
    the hash."""
    import os
    import re
    import tempfile

    from ..sources import read_jsonl, write_jsonl

    docs = _docs(spark, sf_dir)
    # fixed per-sf path, overwritten in place: a fresh mkdtemp per call
    # would leak a directory every bench rep
    out = os.path.join(
        tempfile.gettempdir(),
        "d34_jsonl_" + re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir),
    )
    write_jsonl(docs, out, compression="gzip", target_shards=4)
    with open(f"{out}/part-extra.json", "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": -1, "text": "x", "lang": "en", '
                 '"source": "__extra", "n_chars": 42}\n')
        fh.write("this is not json\n")
        fh.write('{"doc_id": broken\n')
    good, quar = read_jsonl(spark, out)
    stats = good.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    qrow = quar.agg(F.count("*").alias("n_docs")).select(
        F.lit("__quarantined").alias("source"),
        "n_docs",
        F.lit(None).cast("long").alias("total_chars"),
    )
    return stats.unionByName(qrow)


D34_SQL = """
SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars
FROM documents GROUP BY source
UNION ALL SELECT '__extra', 1, 42
UNION ALL SELECT '__quarantined', 2, NULL
"""



# ---------------------------------------------------------------------------
# d35 — incremental dedup of a new batch against the existing corpus
# ---------------------------------------------------------------------------

def d35_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A simulated arriving batch: verbatim re-crawls (exact), lightly
    edited re-crawls (one appended token -> band collisions), and
    genuinely fresh text. Classified against the full documents corpus
    with semi-joins only — no pair expansion anywhere."""
    docs = _docs_wide(spark, sf_dir).select("doc_id", "text")
    new_batch = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 7000000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 5 == 1).select(
                (F.col("doc_id") + 8000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" extrawordZZZ")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 5 == 2).select(
                (F.col("doc_id") + 9000000).alias("doc_id"),
                F.concat(
                    F.lit("unique document "), F.col("doc_id").cast("string"),
                    F.lit(" payload alpha beta"),
                ).alias("text"),
            )
        )
    )
    # corpus-side bands from the shared shingle pass (the "maintained
    # corpus tables" injection point the operator exposes for ingest)
    corpus_bands = dedup._band_keys(
        _signatures_cached(spark, sf_dir), "doc_id", 6, 2,
    ).select("band", "key").distinct()
    return dedup.incremental_dedup(new_batch, docs, corpus_bands=corpus_bands)


_NEWDOCS_SQL = """
  SELECT doc_id + 7000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 8000000, text || ' extrawordZZZ'
  FROM documents WHERE doc_id % 5 = 1
  UNION ALL
  SELECT doc_id + 9000000,
         'unique document ' || doc_id || ' payload alpha beta'
  FROM documents WHERE doc_id % 5 = 2
"""


def _band_sql(src: str) -> str:
    """D03-style minhash banding CTE chain over ``src`` (doc_id, text)."""
    return f"""
sh_{src} AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(words) - 1, 1)),
                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
           AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM {src})
),
sig_{src} AS (
  SELECT doc_id,
         min(CASE WHEN seed = 0 THEN h END) AS h0,
         min(CASE WHEN seed = 1 THEN h END) AS h1,
         min(CASE WHEN seed = 2 THEN h END) AS h2,
         min(CASE WHEN seed = 3 THEN h END) AS h3,
         min(CASE WHEN seed = 4 THEN h END) AS h4,
         min(CASE WHEN seed = 5 THEN h END) AS h5
  FROM (SELECT doc_id, seed, md5(seed::varchar || chr(31) || shingle) AS h
        FROM sh_{src}, (SELECT unnest(range(6)) AS seed))
  GROUP BY doc_id
),
bands_{src} AS (
  SELECT doc_id, 0 AS band, h0 || chr(31) || h1 AS key FROM sig_{src}
  UNION ALL SELECT doc_id, 1, h2 || chr(31) || h3 FROM sig_{src}
  UNION ALL SELECT doc_id, 2, h4 || chr(31) || h5 FROM sig_{src}
)"""


D35_SQL = f"""
WITH newdocs AS ({_NEWDOCS_SQL}),
exact AS (
  SELECT n.doc_id FROM newdocs n
  WHERE md5(n.text) IN (SELECT md5(text) FROM documents)
),
rest AS (
  SELECT * FROM newdocs WHERE doc_id NOT IN (SELECT doc_id FROM exact)
),
{_band_sql("rest")},
{_band_sql("documents")},
near AS (
  SELECT DISTINCT r.doc_id
  FROM bands_rest r
  WHERE EXISTS (SELECT 1 FROM bands_documents c
                WHERE c.band = r.band AND c.key = r.key)
)
SELECT n.doc_id,
       CASE WHEN n.doc_id IN (SELECT doc_id FROM exact) THEN 'exact'
            WHEN n.doc_id IN (SELECT doc_id FROM near) THEN 'near'
            ELSE 'novel' END AS status
FROM newdocs n
"""



# ---------------------------------------------------------------------------
# d36 — corpus-wide repeated-block removal (C4-style boilerplate cut)
# ---------------------------------------------------------------------------

def d36_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.block_dedup(
        _docs_wide(spark, sf_dir).select("doc_id", "text"),
        block_words=4, max_df=1,
    )


D36_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
b AS (
  SELECT doc_id, i AS block_ix,
         array_to_string(words[(i*4+1):(i*4+4)], ' ') AS block
  FROM (SELECT doc_id, words,
               UNNEST(range(0, CAST(ceil(len(words)/4.0) AS INT))) AS i
        FROM w)
),
hot AS (SELECT block FROM b GROUP BY block HAVING count(DISTINCT doc_id) > 1),
f AS (SELECT b.*, (b.block IN (SELECT block FROM hot)) AS is_hot FROM b)
SELECT doc_id,
       count(*) AS n_blocks,
       CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       md5(coalesce(
         string_agg(CASE WHEN NOT is_hot THEN block END, ' '
                    ORDER BY block_ix), '')) AS clean_hash
FROM f GROUP BY doc_id
"""



# ---------------------------------------------------------------------------
# d37 — k-means quantizer training (Lloyd's, 3 unrolled iterations)
# ---------------------------------------------------------------------------

def d37_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.kmeans_fit(_emb(spark, sf_dir), k=8, n_iter=3)


D37_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS c FROM v WHERE vec_id < 8),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))),
                      c.cid) AS rn
    FROM v, c0 c) WHERE rn = 1
),
m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 65)) AS pos, unnest(v.v) AS x
        FROM a1 a JOIN v USING (vec_id))
  GROUP BY 1, 2
),
nc1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM m1 GROUP BY cid),
c1 AS (
  SELECT c0.cid, coalesce(nc1.c, c0.c) AS c
  FROM c0 LEFT JOIN nc1 USING (cid)
),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))),
                      c.cid) AS rn
    FROM v, c1 c) WHERE rn = 1
),
m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 65)) AS pos, unnest(v.v) AS x
        FROM a2 a JOIN v USING (vec_id))
  GROUP BY 1, 2
),
nc2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM m2 GROUP BY cid),
c2 AS (
  SELECT c1.cid, coalesce(nc2.c, c1.c) AS c
  FROM c1 LEFT JOIN nc2 USING (cid)
),
a3 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))),
                      c.cid) AS rn
    FROM v, c2 c) WHERE rn = 1
),
m3 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 65)) AS pos, unnest(v.v) AS x
        FROM a3 a JOIN v USING (vec_id))
  GROUP BY 1, 2
),
nc3 AS (SELECT cid, list(m ORDER BY pos) AS c FROM m3 GROUP BY cid),
c3 AS (
  SELECT c2.cid, coalesce(nc3.c, c2.c) AS c
  FROM c2 LEFT JOIN nc3 USING (cid)
),
af AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))),
                      c.cid) AS rn
    FROM v, c3 c) WHERE rn = 1
),
cnt AS (SELECT cid, count(*) AS n_members FROM af GROUP BY cid)
SELECT e.cid AS cluster_id,
       CAST(e.pos - 1 AS INT) AS dim_ix,
       round(e.x, 6) AS val,
       coalesce(cnt.n_members, 0) AS n_members
FROM (SELECT cid, unnest(range(1, 65)) AS pos, unnest(c) AS x FROM c3) e
LEFT JOIN cnt USING (cid)
"""



# ---------------------------------------------------------------------------
# d38 — hive-partitioned corpus layout roundtrip (pruned read under oracle)
# ---------------------------------------------------------------------------

def d38_partitioned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes the corpus through the partitioned layout writer
    (lang-partitioned, doc_id-sorted shards), reads one language back
    through the pruning reader, and aggregates — so the oracle verifies
    the layout preserved the data exactly while the scan only touched
    the lang=en directory (PartitionFilters, asserted in pytest)."""
    import os
    import re
    import tempfile

    from ..sources import read_corpus, write_corpus

    docs = _docs(spark, sf_dir)
    out = os.path.join(
        tempfile.gettempdir(),
        "d38_corpus_" + re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir),
    )
    write_corpus(docs, out, partition_by=["lang"], sort_by=["doc_id"],
                 target_shards=2)
    en = read_corpus(spark, out, lang="en")
    return en.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


D38_SQL = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents WHERE lang = 'en' GROUP BY source
"""



# ---------------------------------------------------------------------------
# d39 — exact per-source length quantiles (datasheet statistics)
# ---------------------------------------------------------------------------

def d39_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.length_quantiles(
        _docs(spark, sf_dir), strata_col="source", value_col="n_chars",
        quantiles=(0.5, 0.9, 0.99),
    )


D39_SQL = """
SELECT source, count(*) AS n,
       round(quantile_cont(n_chars, 0.5), 6) AS q_5,
       round(quantile_cont(n_chars, 0.9), 6) AS q_9,
       round(quantile_cont(n_chars, 0.99), 6) AS q_99
FROM documents GROUP BY source
"""



# ---------------------------------------------------------------------------
# d40 — encoding quality / mojibake detection (artifacts injected)
# ---------------------------------------------------------------------------

def d40_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus text is clean, so deterministic artifacts are
    injected first (same CASE in the oracle): mangled accents for
    doc_id%7==0, replacement chars for ==1, C0 controls for ==2."""
    from ..llm.curation import encoding_quality

    d = F.col("doc_id")
    corrupted = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(d % 7 == 0, F.regexp_replace("text", "a", "\u00c3\u00a9"))
        .when(d % 7 == 1, F.concat(F.col("text"), F.lit(" \ufffd x \ufffd")))
        .when(d % 7 == 2, F.concat(F.col("text"), F.lit("\x01\x02\x03")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return encoding_quality(corrupted)


def _d40_sql() -> str:
    from ..llm.curation import CONTROL_RE, MOJIBAKE_RE, REPLACEMENT_RE

    return f"""
WITH corrupted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN replace(text, 'a', '\u00c3\u00a9')
              WHEN doc_id % 7 = 1 THEN text || ' \ufffd x \ufffd'
              WHEN doc_id % 7 = 2 THEN text || chr(1) || chr(2) || chr(3)
              ELSE text END AS text
  FROM documents
),
counted AS (
  SELECT doc_id, length(text) AS n_chars,
         len(regexp_extract_all(text, '{REPLACEMENT_RE}')) AS n_replacement,
         len(regexp_extract_all(text, '{CONTROL_RE}')) AS n_control,
         len(regexp_extract_all(text, '{MOJIBAKE_RE}')) AS n_mojibake
  FROM corrupted
)
SELECT doc_id, n_chars,
       CAST(n_replacement AS INT) AS n_replacement,
       CAST(n_control AS INT) AS n_control,
       CAST(n_mojibake AS INT) AS n_mojibake,
       round(greatest(0.0,
         1 - 10.0 * (n_replacement + n_control + n_mojibake) / n_chars), 6)
         AS enc_score
FROM counted
"""



# ---------------------------------------------------------------------------
# d41 — duplicated-span detection (stride-shingled substring dedup)
# ---------------------------------------------------------------------------

def d41_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.duplicate_spans(
        _docs_wide(spark, sf_dir).select("doc_id", "text"),
        width=8, stride=4, max_df=1,
    )


D41_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
wins AS (
  SELECT doc_id, len(words) AS n,
         (i - 1) * 4 AS start,
         array_to_string(words[((i-1)*4+1):((i-1)*4+8)], ' ') AS win
  FROM (SELECT doc_id, words,
               UNNEST(range(1, CAST(floor((len(words) - 8) / 4.0) AS INT) + 2))
                 AS i
        FROM w WHERE len(words) >= 8)
),
hot AS (SELECT win FROM wins GROUP BY win HAVING count(DISTINCT doc_id) > 1),
fl AS (
  SELECT doc_id, count(*) AS n_flagged,
         list_sort(list(start)) AS ss
  FROM wins WHERE win IN (SELECT win FROM hot)
  GROUP BY doc_id
),
cov AS (
  SELECT doc_id, n_flagged,
         CASE WHEN len(ss) > 1
              THEN list_sum(list_transform(range(1, len(ss)),
                     i -> least(ss[i+1] - ss[i], 8))) + 8
              ELSE 8 END AS coverage
  FROM fl
),
tot AS (SELECT doc_id, count(*) AS n_windows, max(n) AS n
        FROM wins GROUP BY doc_id)
SELECT t.doc_id,
       t.n_windows,
       CAST(coalesce(c.n_flagged, 0) AS INT) AS n_flagged,
       CAST(coalesce(c.coverage, 0) AS INT) AS dup_token_coverage,
       round(coalesce(c.coverage, 0) / t.n, 6) AS dup_coverage_frac
FROM tot t LEFT JOIN cov c USING (doc_id)
"""



# ---------------------------------------------------------------------------
# d42 — product quantization codes (per-subspace Lloyd's, unrolled oracle)
# ---------------------------------------------------------------------------

def _pq_model_cached(spark: SparkSession, sf_dir: str):
    """The trained PQ model (codes + codebooks) is an index-build
    artifact: d42 reports the codes, d43 searches with them. Train the
    Lloyd loop once per session and persist the code table."""
    cache = _session_cache(spark)
    key = ("pq_model", sf_dir)
    if key not in cache:
        codes, books = similarity.pq_train(
            _emb(spark, sf_dir), dim=64, m=4, k=4, n_iter=2
        )
        cache[key] = (codes.persist(), books)
    return cache[key]


def d42_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_model_cached(spark, sf_dir)[0]


D42_SQL = """
WITH vs0 AS (
  SELECT vec_id, list_transform(embedding[1:16], x -> x::double) AS v
  FROM embeddings
),
s0c0 AS (SELECT vec_id AS cid, v AS c FROM vs0 WHERE vec_id < 4),
s0a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs0 v, s0c0 c) WHERE rn = 1
),
s0m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s0a1 a JOIN vs0 v USING (vec_id))
  GROUP BY 1, 2
),
s0n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s0m1 GROUP BY cid),
s0c1 AS (
  SELECT s0c0.cid, coalesce(s0n1.c, s0c0.c) AS c
  FROM s0c0 LEFT JOIN s0n1 USING (cid)
),
s0a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs0 v, s0c1 c) WHERE rn = 1
),
s0m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s0a2 a JOIN vs0 v USING (vec_id))
  GROUP BY 1, 2
),
s0n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s0m2 GROUP BY cid),
s0c2 AS (
  SELECT s0c1.cid, coalesce(s0n2.c, s0c1.c) AS c
  FROM s0c1 LEFT JOIN s0n2 USING (cid)
),
s0f AS (
  SELECT vec_id, cid AS code_0, d AS e0 FROM (
    SELECT v.vec_id, c.cid, list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))) AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs0 v, s0c2 c) WHERE rn = 1
),
vs1 AS (
  SELECT vec_id, list_transform(embedding[17:32], x -> x::double) AS v
  FROM embeddings
),
s1c0 AS (SELECT vec_id AS cid, v AS c FROM vs1 WHERE vec_id < 4),
s1a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs1 v, s1c0 c) WHERE rn = 1
),
s1m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s1a1 a JOIN vs1 v USING (vec_id))
  GROUP BY 1, 2
),
s1n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s1m1 GROUP BY cid),
s1c1 AS (
  SELECT s1c0.cid, coalesce(s1n1.c, s1c0.c) AS c
  FROM s1c0 LEFT JOIN s1n1 USING (cid)
),
s1a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs1 v, s1c1 c) WHERE rn = 1
),
s1m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s1a2 a JOIN vs1 v USING (vec_id))
  GROUP BY 1, 2
),
s1n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s1m2 GROUP BY cid),
s1c2 AS (
  SELECT s1c1.cid, coalesce(s1n2.c, s1c1.c) AS c
  FROM s1c1 LEFT JOIN s1n2 USING (cid)
),
s1f AS (
  SELECT vec_id, cid AS code_1, d AS e1 FROM (
    SELECT v.vec_id, c.cid, list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))) AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs1 v, s1c2 c) WHERE rn = 1
),
vs2 AS (
  SELECT vec_id, list_transform(embedding[33:48], x -> x::double) AS v
  FROM embeddings
),
s2c0 AS (SELECT vec_id AS cid, v AS c FROM vs2 WHERE vec_id < 4),
s2a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs2 v, s2c0 c) WHERE rn = 1
),
s2m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s2a1 a JOIN vs2 v USING (vec_id))
  GROUP BY 1, 2
),
s2n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s2m1 GROUP BY cid),
s2c1 AS (
  SELECT s2c0.cid, coalesce(s2n1.c, s2c0.c) AS c
  FROM s2c0 LEFT JOIN s2n1 USING (cid)
),
s2a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs2 v, s2c1 c) WHERE rn = 1
),
s2m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s2a2 a JOIN vs2 v USING (vec_id))
  GROUP BY 1, 2
),
s2n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s2m2 GROUP BY cid),
s2c2 AS (
  SELECT s2c1.cid, coalesce(s2n2.c, s2c1.c) AS c
  FROM s2c1 LEFT JOIN s2n2 USING (cid)
),
s2f AS (
  SELECT vec_id, cid AS code_2, d AS e2 FROM (
    SELECT v.vec_id, c.cid, list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))) AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs2 v, s2c2 c) WHERE rn = 1
),
vs3 AS (
  SELECT vec_id, list_transform(embedding[49:64], x -> x::double) AS v
  FROM embeddings
),
s3c0 AS (SELECT vec_id AS cid, v AS c FROM vs3 WHERE vec_id < 4),
s3a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs3 v, s3c0 c) WHERE rn = 1
),
s3m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s3a1 a JOIN vs3 v USING (vec_id))
  GROUP BY 1, 2
),
s3n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s3m1 GROUP BY cid),
s3c1 AS (
  SELECT s3c0.cid, coalesce(s3n1.c, s3c0.c) AS c
  FROM s3c0 LEFT JOIN s3n1 USING (cid)
),
s3a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs3 v, s3c1 c) WHERE rn = 1
),
s3m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM s3a2 a JOIN vs3 v USING (vec_id))
  GROUP BY 1, 2
),
s3n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM s3m2 GROUP BY cid),
s3c2 AS (
  SELECT s3c1.cid, coalesce(s3n2.c, s3c1.c) AS c
  FROM s3c1 LEFT JOIN s3n2 USING (cid)
),
s3f AS (
  SELECT vec_id, cid AS code_3, d AS e3 FROM (
    SELECT v.vec_id, c.cid, list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))) AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM vs3 v, s3c2 c) WHERE rn = 1
)
SELECT s0f.vec_id,
       s0f.code_0, s1f.code_1, s2f.code_2, s3f.code_3,
       round(sqrt(s0f.e0 + s1f.e1 + s2f.e2 + s3f.e3), 6) AS recon_error
FROM s0f JOIN s1f USING (vec_id) JOIN s2f USING (vec_id)
         JOIN s3f USING (vec_id)
"""



# ---------------------------------------------------------------------------
# d43 — IVF-PQ search (cell routing + asymmetric-distance scoring)
# ---------------------------------------------------------------------------

def d43_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivfpq_topk(
        emb, queries, anchors, dim=64, k=3, n_probe=2,
        model=_pq_model_cached(spark, sf_dir),
    )


def _d56_k(n: int) -> int:
    """SemDeDup cluster count: grows with the corpus so cells stay
    ~250 vectors and the per-cell |cell|^2 pass stays linear overall —
    the paper's own scale knob (k ~ |D| / target cell size). FIXED k
    made the pairwise stage quadratic: measured 33x wall at 10x rows
    (sf1 run, r6). 8 at the oracle sizes (n <= 2000 — pinned hash
    unchanged), 80 at sf1."""
    return max(8, n // 250)


def _ivf_cells_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d56's cell routing — an index-build artifact (the |D|xk
    assignment pass) that otherwise recomputes in all three branches of
    the semantic-dedup plan; persist it once per session."""
    cache = _session_cache(spark)
    k = _d56_k(_emb_count_cached(spark, sf_dir))
    key = ("ivf_cells", sf_dir, k)
    if key not in cache:
        # the |D| x k routing crossJoin is flop-heavy and NARROW: the
        # harness parquet is 1-2 row groups, so without a fan-out the
        # whole build runs on 2 cores (the _docs_wide problem; measured
        # 14 s -> ~2 s cold at sf1). The anchors side stays a plain
        # read — it is k rows, filtered before the broadcast.
        emb = _emb(spark, sf_dir)
        wide = emb.repartition(spark.sparkContext.defaultParallelism)
        cache[key] = similarity.ivf_assign(
            wide, emb.filter(F.col("vec_id") < k)
        ).persist()
    return cache[key]


def d56_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(
        F.col("vec_id") < _d56_k(_emb_count_cached(spark, sf_dir))
    )
    return similarity.semantic_dedup(
        emb, anchors, threshold=0.35,
        cells=_ivf_cells_cached(spark, sf_dir),
    )


D56_SQL = """
WITH anchors AS (SELECT vec_id AS anchor_id, embedding FROM embeddings
                 WHERE vec_id < 8),
sims AS (
  SELECT v.vec_id, a.anchor_id, round(
           list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * v.embedding[i]::double))
           / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * a.embedding[i]::double)))
              * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::double * v.embedding[i]::double)))),
         6) AS sim
  FROM embeddings v CROSS JOIN anchors a
),
assign AS (
  SELECT vec_id, anchor_id FROM (
    SELECT vec_id, anchor_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, anchor_id) AS rn
    FROM sims) WHERE rn = 1
),
pairs AS (
  SELECT n.vec_id, o.vec_id AS oid, round(
           list_sum(list_transform(range(1, 65), i -> nv.embedding[i]::double * ov.embedding[i]::double))
           / (sqrt(list_sum(list_transform(range(1, 65), i -> nv.embedding[i]::double * nv.embedding[i]::double)))
              * sqrt(list_sum(list_transform(range(1, 65), i -> ov.embedding[i]::double * ov.embedding[i]::double)))),
         6) AS cos
  FROM assign n JOIN assign o
    ON n.anchor_id = o.anchor_id AND o.vec_id < n.vec_id
  JOIN embeddings nv ON nv.vec_id = n.vec_id
  JOIN embeddings ov ON ov.vec_id = o.vec_id
),
qual AS (
  SELECT vec_id, min(oid) AS dup_of, arg_min(cos, oid) AS dup_cos
  FROM pairs WHERE cos >= 0.35 GROUP BY vec_id
)
SELECT a.vec_id, a.anchor_id, q.dup_of, q.dup_cos
FROM assign a LEFT JOIN qual q USING (vec_id)
"""


def d57_semantic_dedup_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the PAPER's keep policy: within a duplicate group
    the member farthest from its cluster centroid survives (Abbas et
    al. 2023 §3); same cells, threshold and plan shape as d56."""
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(
        F.col("vec_id") < _d56_k(_emb_count_cached(spark, sf_dir))
    )
    return similarity.semantic_dedup(
        emb, anchors, threshold=0.35,
        cells=_ivf_cells_cached(spark, sf_dir), keep="centroid_far",
    )


D57_SQL = """
WITH anchors AS (SELECT vec_id AS anchor_id, embedding FROM embeddings
                 WHERE vec_id < 8),
sims AS (
  SELECT v.vec_id, a.anchor_id, round(
           list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * v.embedding[i]::double))
           / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * a.embedding[i]::double)))
              * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::double * v.embedding[i]::double)))),
         6) AS sim
  FROM embeddings v CROSS JOIN anchors a
),
assign AS (
  SELECT vec_id, anchor_id, sim AS ccos FROM (
    SELECT vec_id, anchor_id, sim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, anchor_id) AS rn
    FROM sims) WHERE rn = 1
),
pairs AS (
  SELECT n.vec_id, o.vec_id AS oid, o.ccos AS occos, round(
           list_sum(list_transform(range(1, 65), i -> nv.embedding[i]::double * ov.embedding[i]::double))
           / (sqrt(list_sum(list_transform(range(1, 65), i -> nv.embedding[i]::double * nv.embedding[i]::double)))
              * sqrt(list_sum(list_transform(range(1, 65), i -> ov.embedding[i]::double * ov.embedding[i]::double)))),
         6) AS cos
  FROM assign n JOIN assign o
    ON n.anchor_id = o.anchor_id
   AND (o.ccos < n.ccos OR (o.ccos = n.ccos AND o.vec_id < n.vec_id))
  JOIN embeddings nv ON nv.vec_id = n.vec_id
  JOIN embeddings ov ON ov.vec_id = o.vec_id
),
qual AS (
  SELECT vec_id, oid AS dup_of, cos AS dup_cos FROM (
    SELECT vec_id, oid, cos,
           row_number() OVER (PARTITION BY vec_id ORDER BY occos, oid) AS rn
    FROM pairs WHERE cos >= 0.35) WHERE rn = 1
)
SELECT a.vec_id, a.anchor_id, q.dup_of, q.dup_cos
FROM assign a LEFT JOIN qual q USING (vec_id)
"""


def d55_ivfpq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivfpq_topk_refined(
        emb, queries, anchors, dim=64, k=3, rerank=3, n_probe=2,
        model=_pq_model_cached(spark, sf_dir),
    )


_IVFPQ_BODY = """
WITH pvs0 AS (
  SELECT vec_id, list_transform(embedding[1:16], x -> x::double) AS v
  FROM embeddings
),
p0c0 AS (SELECT vec_id AS cid, v AS c FROM pvs0 WHERE vec_id < 4),
p0a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs0 v, p0c0 c) WHERE rn = 1
),
p0m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p0a1 a JOIN pvs0 v USING (vec_id))
  GROUP BY 1, 2
),
p0n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p0m1 GROUP BY cid),
p0c1 AS (
  SELECT p0c0.cid, coalesce(p0n1.c, p0c0.c) AS c
  FROM p0c0 LEFT JOIN p0n1 USING (cid)
),
p0a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs0 v, p0c1 c) WHERE rn = 1
),
p0m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p0a2 a JOIN pvs0 v USING (vec_id))
  GROUP BY 1, 2
),
p0n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p0m2 GROUP BY cid),
p0c2 AS (
  SELECT p0c1.cid, coalesce(p0n2.c, p0c1.c) AS c
  FROM p0c1 LEFT JOIN p0n2 USING (cid)
),
p0code AS (
  SELECT vec_id, cid AS code FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs0 v, p0c2 c) WHERE rn = 1
),
p0adc AS (
  SELECT q.vec_id AS query_id, c.cid, list_sum(list_transform(range(1, 17), i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i]))) AS d2
  FROM (SELECT vec_id, v FROM pvs0 WHERE vec_id < 10) q, p0c2 c
),
pvs1 AS (
  SELECT vec_id, list_transform(embedding[17:32], x -> x::double) AS v
  FROM embeddings
),
p1c0 AS (SELECT vec_id AS cid, v AS c FROM pvs1 WHERE vec_id < 4),
p1a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs1 v, p1c0 c) WHERE rn = 1
),
p1m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p1a1 a JOIN pvs1 v USING (vec_id))
  GROUP BY 1, 2
),
p1n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p1m1 GROUP BY cid),
p1c1 AS (
  SELECT p1c0.cid, coalesce(p1n1.c, p1c0.c) AS c
  FROM p1c0 LEFT JOIN p1n1 USING (cid)
),
p1a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs1 v, p1c1 c) WHERE rn = 1
),
p1m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p1a2 a JOIN pvs1 v USING (vec_id))
  GROUP BY 1, 2
),
p1n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p1m2 GROUP BY cid),
p1c2 AS (
  SELECT p1c1.cid, coalesce(p1n2.c, p1c1.c) AS c
  FROM p1c1 LEFT JOIN p1n2 USING (cid)
),
p1code AS (
  SELECT vec_id, cid AS code FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs1 v, p1c2 c) WHERE rn = 1
),
p1adc AS (
  SELECT q.vec_id AS query_id, c.cid, list_sum(list_transform(range(1, 17), i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i]))) AS d2
  FROM (SELECT vec_id, v FROM pvs1 WHERE vec_id < 10) q, p1c2 c
),
pvs2 AS (
  SELECT vec_id, list_transform(embedding[33:48], x -> x::double) AS v
  FROM embeddings
),
p2c0 AS (SELECT vec_id AS cid, v AS c FROM pvs2 WHERE vec_id < 4),
p2a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs2 v, p2c0 c) WHERE rn = 1
),
p2m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p2a1 a JOIN pvs2 v USING (vec_id))
  GROUP BY 1, 2
),
p2n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p2m1 GROUP BY cid),
p2c1 AS (
  SELECT p2c0.cid, coalesce(p2n1.c, p2c0.c) AS c
  FROM p2c0 LEFT JOIN p2n1 USING (cid)
),
p2a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs2 v, p2c1 c) WHERE rn = 1
),
p2m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p2a2 a JOIN pvs2 v USING (vec_id))
  GROUP BY 1, 2
),
p2n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p2m2 GROUP BY cid),
p2c2 AS (
  SELECT p2c1.cid, coalesce(p2n2.c, p2c1.c) AS c
  FROM p2c1 LEFT JOIN p2n2 USING (cid)
),
p2code AS (
  SELECT vec_id, cid AS code FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs2 v, p2c2 c) WHERE rn = 1
),
p2adc AS (
  SELECT q.vec_id AS query_id, c.cid, list_sum(list_transform(range(1, 17), i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i]))) AS d2
  FROM (SELECT vec_id, v FROM pvs2 WHERE vec_id < 10) q, p2c2 c
),
pvs3 AS (
  SELECT vec_id, list_transform(embedding[49:64], x -> x::double) AS v
  FROM embeddings
),
p3c0 AS (SELECT vec_id AS cid, v AS c FROM pvs3 WHERE vec_id < 4),
p3a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs3 v, p3c0 c) WHERE rn = 1
),
p3m1 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p3a1 a JOIN pvs3 v USING (vec_id))
  GROUP BY 1, 2
),
p3n1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p3m1 GROUP BY cid),
p3c1 AS (
  SELECT p3c0.cid, coalesce(p3n1.c, p3c0.c) AS c
  FROM p3c0 LEFT JOIN p3n1 USING (cid)
),
p3a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs3 v, p3c1 c) WHERE rn = 1
),
p3m2 AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 17)) AS pos, unnest(v.v) AS x
        FROM p3a2 a JOIN pvs3 v USING (vec_id))
  GROUP BY 1, 2
),
p3n2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM p3m2 GROUP BY cid),
p3c2 AS (
  SELECT p3c1.cid, coalesce(p3n2.c, p3c1.c) AS c
  FROM p3c1 LEFT JOIN p3n2 USING (cid)
),
p3code AS (
  SELECT vec_id, cid AS code FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_sum(list_transform(range(1, 17), i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), c.cid) AS rn
    FROM pvs3 v, p3c2 c) WHERE rn = 1
),
p3adc AS (
  SELECT q.vec_id AS query_id, c.cid, list_sum(list_transform(range(1, 17), i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i]))) AS d2
  FROM (SELECT vec_id, v FROM pvs3 WHERE vec_id < 10) q, p3c2 c
),
anchors AS (SELECT vec_id AS anchor_id, embedding FROM embeddings WHERE vec_id < 4),
assign AS (
  SELECT vec_id, anchor_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, anchor_id) AS rn
  FROM (
    SELECT v.vec_id, a.anchor_id, round(
             list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * v.embedding[i]::double))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::double * a.embedding[i]::double)))
                * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::double * v.embedding[i]::double)))),
           6) AS sim
    FROM embeddings v CROSS JOIN anchors a
  )
),
cells AS (SELECT vec_id, anchor_id FROM assign WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, anchor_id FROM assign
           WHERE rn <= 2 AND vec_id < 10),
cand AS (
  SELECT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN cells c USING (anchor_id)
  WHERE c.vec_id != p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(a0.d2 + a1.d2 + a2.d2 + a3.d2, 6) AS approx_dist
  FROM cand
  JOIN p0code c0 ON c0.vec_id = cand.neighbor_id
  JOIN p1code c1 ON c1.vec_id = cand.neighbor_id
  JOIN p2code c2 ON c2.vec_id = cand.neighbor_id
  JOIN p3code c3 ON c3.vec_id = cand.neighbor_id
  JOIN p0adc a0 ON a0.query_id = cand.query_id AND a0.cid = c0.code
  JOIN p1adc a1 ON a1.query_id = cand.query_id AND a1.cid = c1.code
  JOIN p2adc a2 ON a2.query_id = cand.query_id AND a2.cid = c2.code
  JOIN p3adc a3 ON a3.query_id = cand.query_id AND a3.cid = c3.code
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_dist, neighbor_id) AS rank
  FROM scored
)"""

D43_SQL = _IVFPQ_BODY + """
SELECT query_id, neighbor_id, approx_dist, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""

# d55 — the FAISS refine step: ADC top-(k x rerank) pool, exact L2
# re-rank over only those candidate vectors (mirrors
# similarity.ivfpq_topk_refined with k=3, rerank=3).
D55_SQL = _IVFPQ_BODY + """,
pool AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 9),
exact AS (
  SELECT p.query_id, p.neighbor_id,
         round(list_sum(list_transform(range(1, 65),
           i -> (q.embedding[i]::double - v.embedding[i]::double)
              * (q.embedding[i]::double - v.embedding[i]::double))), 6) AS dist
  FROM pool p
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings v ON v.vec_id = p.neighbor_id
),
rr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, neighbor_id) AS rank
  FROM exact
)
SELECT query_id, neighbor_id, dist, CAST(rank AS INT) AS rank
FROM rr WHERE rank <= 3
"""



# ---------------------------------------------------------------------------
# d44 — corpus snapshot diff (release audit)
# ---------------------------------------------------------------------------

def d44_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 of the corpus derived deterministically: every 11th doc
    dropped, the next cohort's text edited, a batch of new ids
    appended — the diff labels all four classes (same CASE in SQL)."""
    from ..llm.curation import snapshot_diff

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    d = F.col("doc_id")
    v2 = (
        docs.filter(d % 11 != 0)
        .select(
            "doc_id",
            F.when(d % 11 == 1, F.concat(F.col("text"), F.lit(" [edited v2]")))
            .otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.filter(d % 11 == 2).select(
                (d + 5000000).alias("doc_id"), "text"
            )
        )
    )
    return snapshot_diff(docs, v2)


D44_SQL = """
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 1 THEN text || ' [edited v2]'
              ELSE text END AS text
  FROM documents WHERE doc_id % 11 != 0
  UNION ALL
  SELECT doc_id + 5000000, text FROM documents WHERE doc_id % 11 = 2
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN md5(o.text) != md5(n.text) THEN 'changed'
            ELSE 'unchanged' END AS status
FROM documents o FULL OUTER JOIN v2 n USING (doc_id)
"""



# ---------------------------------------------------------------------------
# d45 — deterministic importance-weighted sampling
# ---------------------------------------------------------------------------

def d45_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.weighted_sample(
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars"),
        rate=0.3, weight_col="n_chars",
    )


D45_SQL = """
WITH mw AS (SELECT avg(n_chars) AS m FROM documents)
SELECT doc_id, source, n_chars
FROM documents, mw
WHERE (0.3 * n_chars / m >= 1.0)
   OR substr(md5('weighted' || ':' || doc_id), 1, 8)
      < printf('%08x',
               CAST(least(1.0, 0.3 * n_chars / m) * 4294967296.0 AS BIGINT))
"""


# ---------------------------------------------------------------------------
# d46 — BPE merge-pair counts (one tokenizer-training iteration's scoring)
# ---------------------------------------------------------------------------

def d46_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return txt.bpe_pair_counts(_docs(spark, sf_dir), top_n=30)


D46_SQL = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
freq AS (
  SELECT word, count(*) AS f FROM words WHERE len(word) >= 2 GROUP BY word
),
pairs AS (
  SELECT word, f,
         unnest(list_transform(range(1, len(word)),
                               i -> substr(word, i, 2))) AS pair
  FROM freq
)
SELECT pair, CAST(sum(f) AS BIGINT) AS weight,
       count(DISTINCT word) AS n_word_forms
FROM pairs GROUP BY pair ORDER BY weight DESC, pair LIMIT 30
"""


# ---------------------------------------------------------------------------
# d47 — exact-dup rate per ingest source (curation dashboard metric),
# on a corpus where a deterministic 40% hash-sample got re-crawled
# ---------------------------------------------------------------------------

def d47_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import dup_rate_by_source

    docs = _docs(spark, sf_dir).select("source", "doc_id", "text")
    recrawl = sampling.hash_sample(
        docs, 0.4, key_col="doc_id", salt="recrawl"
    ).withColumn("doc_id", F.col("doc_id") + 1000000)
    return dup_rate_by_source(docs.unionByName(recrawl))


D47_SQL = """
WITH corpus AS (
  SELECT source, doc_id, md5(text) AS h FROM documents
  UNION ALL
  SELECT source, doc_id + 1000000, md5(text) FROM documents
  WHERE substr(md5('recrawl' || ':' || doc_id), 1, 8) < '66666666'
),
groups AS (
  SELECT h, count(*) AS cnt, min(doc_id) AS canon FROM corpus GROUP BY h
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN cnt > 1 AND doc_id <> canon THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dupes,
       round(avg(CASE WHEN cnt > 1 AND doc_id <> canon
                 THEN 1.0 ELSE 0.0 END), 6) AS dup_rate
FROM corpus JOIN groups USING (h)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# d48 — deterministic training-shard manifest (256 hash shards)
# ---------------------------------------------------------------------------

def d48_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.shard_manifest(
        _docs(spark, sf_dir), n_shards=256, weight_col="n_chars"
    )


D48_SQL = """
SELECT substr(md5('shard' || ':' || doc_id), 1, 2) AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_weight,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# d49 — fixed-length training rows (GPT-style token-stream re-cut)
# ---------------------------------------------------------------------------

def d49_fixed_len_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.packing import chunk_token_stream

    docs = _docs_wide(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.filter(F.split("text", " "), lambda w: w != "").alias("tokens"),
    )
    return chunk_token_stream(docs, seq_len=64, shard_col="lang")


D49_SQL = """
WITH toks AS (
  SELECT lang AS shard, doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') AS tokens
  FROM documents
),
offs AS (
  SELECT shard, tokens,
         sum(len(tokens)) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING)
           - len(tokens) AS start
  FROM toks
),
pos AS (
  SELECT shard,
         unnest(list_transform(range(1, len(tokens) + 1),
                i -> struct_pack(gpos := start + i - 1,
                                 tok := tokens[i]))) AS u
  FROM offs
)
SELECT shard, CAST(u.gpos // 64 AS BIGINT) AS seq_ix, count(*) AS n_tokens,
       string_agg(u.tok, ' ' ORDER BY u.gpos) AS text
FROM pos GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# d50 — inverted index (posting lists) over the corpus vocabulary
# ---------------------------------------------------------------------------

def d50_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.search import inverted_index

    # min_df drops hapax noise; max_df is the stop-token cap bounding
    # the longest posting list (see inverted_index docstring)
    return inverted_index(_docs(spark, sf_dir), min_df=2, max_df=1000)


D50_SQL = """
WITH tok AS (
  SELECT doc_id, t AS token
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE t <> ''
),
per AS (
  SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
)
SELECT token, count(*) AS doc_freq, CAST(sum(tf) AS BIGINT) AS total_tf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM per GROUP BY token
HAVING count(*) BETWEEN 2 AND 1000
"""


# ---------------------------------------------------------------------------
# d51 — canonical text normalization (the pre-dedup cleanup contract)
# ---------------------------------------------------------------------------

def d51_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import normalize_text

    out = normalize_text(_docs(spark, sf_dir))
    return out.withColumn("changed", F.col("changed").cast("int"))


D51_SQL = """
SELECT doc_id,
       CAST(norm <> text AS INT) AS changed,
       length(norm) AS n_chars_norm,
       md5(norm) AS norm_hash
FROM (
  SELECT doc_id, text,
         lower(trim(regexp_replace(
           regexp_replace(text, '[\t\n\r]+', ' ', 'g'), '  +', ' ', 'g'
         ))) AS norm
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# d52 — deterministic global training order without a global sort
# ---------------------------------------------------------------------------

def d52_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.training_order(_docs(spark, sf_dir), salt="epoch0")


D52_SQL = """
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id
       ) - 1 AS position
FROM documents
"""


# ---------------------------------------------------------------------------
# d53 — per-source document cap, BOTH variants (the per-domain crawl
# quota: exact per-group rank, and the two-pass hash-threshold
# mega-domain path) — consolidated from the former d53/d54 twins
# (VERDICT r8 item 3: parameter variants of one operator share a query,
# keeping the registry's staleness bound at 3 rounds)
# ---------------------------------------------------------------------------

def d53_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    exact = sampling.cap_per_group(
        docs, n=25, group_col="source", salt="quota"
    ).select(
        F.lit("exact_rank").alias("method"), "doc_id", "source", "n_chars"
    )
    thresh = sampling.cap_per_group_threshold(
        docs, n=20, group_col="source", salt="quota"
    ).select(
        F.lit("hash_threshold").alias("method"), "doc_id", "source",
        "n_chars",
    )
    return exact.unionByName(thresh)


D53_SQL = """
SELECT 'exact_rank' AS method, doc_id, source, n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY source
  ORDER BY substring(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id
) <= 25
UNION ALL
SELECT 'hash_threshold', doc_id, source, n_chars
FROM documents JOIN (SELECT source, count(*) AS cnt
                     FROM documents GROUP BY 1) c USING (source)
WHERE cnt <= 20
   OR substring(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 8)
      < printf('%08x', CAST(floor(20.0 / cnt * 4294967296.0) AS BIGINT))
"""


# ---------------------------------------------------------------------------
# d58 — KMV distinct-count sketch (mergeable, oracle-exact cardinality
# estimation — llm/sketches.py)
# ---------------------------------------------------------------------------

_D58_K = 64


def d58_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import sketches

    return sketches.kmv_distinct(
        _docs(spark, sf_dir), "text", ["lang"], k=_D58_K
    )


D58_SQL = f"""
WITH h AS (
  SELECT DISTINCT lang,
         ('0x' || substr(md5('kmv' || ':' || text), 1, 15))::BIGINT AS hv
  FROM documents
),
rk AS (
  SELECT lang, hv,
         row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
  FROM h
)
SELECT lang, count(*) AS n_kept, max(hv) AS kth_hash,
       CASE WHEN count(*) < {_D58_K} THEN count(*)
            ELSE floor({_D58_K - 1}.0 * {float(16**15):.1f}
                       / greatest(max(hv), 1)) END::BIGINT AS est_ndv
FROM rk WHERE rn <= {_D58_K} GROUP BY lang
"""


# ---------------------------------------------------------------------------
# d63 — KMV partial-sketch merge (VERDICT r7 item 6): per-shard
# sketches roll up WITHOUT rereading data; merge(sketch(A), sketch(B))
# is bit-identical to sketch(A ∪ B), so the oracle computes the sketch
# over the whole corpus directly
# ---------------------------------------------------------------------------

_D63_K = 48


def d63_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import sketches

    docs = _docs(spark, sf_dir)
    # two "shards" a real pipeline would sketch independently
    part_a = docs.filter(F.col("doc_id") % 2 == 0)
    part_b = docs.filter(F.col("doc_id") % 2 == 1)
    sk = [
        sketches.kmv_sketch(p, "text", ["source"], k=_D63_K, salt="kmvm")
        for p in (part_a, part_b)
    ]
    merged = sketches.kmv_merge(sk, ["source"], k=_D63_K)
    return sketches.kmv_estimate(merged, ["source"], k=_D63_K)


D63_SQL = f"""
WITH h AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5('kmvm' || ':' || text), 1, 15))::BIGINT AS hv
  FROM documents
),
rk AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
  FROM h
)
SELECT source, count(*) AS n_kept, max(hv) AS kth_hash,
       CASE WHEN count(*) < {_D63_K} THEN count(*)
            ELSE floor({_D63_K - 1}.0 * {float(16**15):.1f}
                       / greatest(max(hv), 1)) END::BIGINT AS est_ndv
FROM rk WHERE rn <= {_D63_K} GROUP BY source
"""


# ---------------------------------------------------------------------------
# d64 — KMV pairwise Jaccard: set-overlap estimates between groups from
# their sketches alone (no rescan of the data)
# ---------------------------------------------------------------------------

_D64_K = 40


def d64_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import sketches

    vals = _docs(spark, sf_dir).select(
        "lang", (F.col("n_chars") % 512).alias("v")
    )
    sk = sketches.kmv_sketch(vals, "v", ["lang"], k=_D64_K, salt="kmvj")
    return sketches.kmv_jaccard(sk, ["lang"], k=_D64_K)


D64_SQL = f"""
WITH h AS (
  SELECT DISTINCT lang,
         ('0x' || substr(md5('kmvj' || ':' ||
                             CAST(n_chars % 512 AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM documents
),
rk AS (
  SELECT lang, hv,
         row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
  FROM h
),
sk AS (SELECT lang, hv FROM rk WHERE rn <= {_D64_K}),
pairs AS (
  SELECT a.lang AS la, b.lang AS lb
  FROM (SELECT DISTINCT lang FROM sk) a
  JOIN (SELECT DISTINCT lang FROM sk) b ON a.lang < b.lang
),
u AS (
  SELECT p.la, p.lb, s.hv,
         max(CASE WHEN s.lang = p.la THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.lang = p.lb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.lang IN (p.la, p.lb)
  GROUP BY 1, 2, 3
),
um AS (
  SELECT la, lb, in_a, in_b,
         row_number() OVER (PARTITION BY la, lb ORDER BY hv) AS rn
  FROM u
)
SELECT la AS lang_a, lb AS lang_b,
       CAST(sum(in_a * in_b) AS INT) AS n_common,
       CAST(count(*) AS INT) AS n_union_min,
       sum(in_a * in_b)::DOUBLE / count(*) AS jaccard_est
FROM um WHERE rn <= {_D64_K}
GROUP BY la, lb
"""


# ---------------------------------------------------------------------------
# d65 — media resize plumbing (fake codec: exact byte-budget truncation,
# so the mapInPandas binary round-trip is oracle-checkable end to end)
# ---------------------------------------------------------------------------

def d65_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import multimodal

    media = multimodal.attach_binary(
        _docs(spark, sf_dir), payload_col="text", id_col="doc_id",
        kind="image",
    )
    out = multimodal.resize_media(media, 8, 8)
    # checksum hashes the HEX encoding of the payload, not the raw
    # bytes: the fake codec truncates in BYTE space (a real resize
    # operates on bytes), and this DuckDB's md5() only accepts VARCHAR —
    # a substr(text, ...) oracle would only agree on ASCII-only corpora
    # (ADVICE r8). hex() is injective and both engines uppercase it, so
    # the comparison is byte-exact for any UTF-8 payload.
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.md5(F.hex("data")).alias("checksum"),
    )


D65_SQL = """
SELECT doc_id AS media_id, 8 AS width, 8 AS height,
       least(octet_length(encode(text)), 64)::BIGINT AS n_bytes,
       md5(substring(hex(encode(text)), 1, 128)) AS checksum
FROM documents
"""


# ---------------------------------------------------------------------------
# d66 — keep-first segment dedup (Dolma/CCNet exact paragraph dedup,
# adapted to aligned word blocks; d36's boilerplate cut is the
# drop-from-everyone sibling)
# ---------------------------------------------------------------------------

def d66_segment_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.segment_dedup_keep_first(
        _docs_wide(spark, sf_dir).select("doc_id", "text"),
        block_words=4,
    )


D66_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
b AS (
  SELECT doc_id, i AS block_ix,
         array_to_string(words[(i*4+1):(i*4+4)], ' ') AS block
  FROM (SELECT doc_id, words,
               UNNEST(range(0, CAST(ceil(len(words)/4.0) AS INT))) AS i
        FROM w)
),
f AS (
  SELECT b.*,
         row_number() OVER (PARTITION BY block
                            ORDER BY doc_id, block_ix) = 1 AS keep
  FROM b
)
SELECT doc_id,
       count(*) AS n_blocks,
       CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       md5(coalesce(
         string_agg(CASE WHEN keep THEN block END, ' '
                    ORDER BY block_ix), '')) AS clean_hash
FROM f GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# pristine lifecycle fixtures (VERDICT r13 item 2): d68-d74 measure
# ingest / append / retrain / takedown — the OPERATIONS — so the index
# or layout each one mutates is CLONED from a build-once pristine
# artifact instead of being rebuilt inside every call. The in-query
# rebuilds were 43% of the r13 driver suite (83 s of 196 s) and
# produced every adverse-mover window adjudication in r11-r13. d67
# deliberately KEEPS its cold in-query DedupIndex build so build cost
# stays on the bench record and the scale curve; everything else in
# the family starts from a filesystem copy (~ms at graded sfs).
#
# Staleness: the pristine dir carries a fingerprint of the builder's
# source plus the artifact-layer modules it drives (dedup/similarity/
# corpus) — any code change rebuilds it, so correctness rows can never
# be served from an artifact an older code version wrote. Concurrency
# (ADVICE r13, the d74 shared-tempdir finding): pristine dirs publish
# by build-aside + rename, and every query mutates a WORKING COPY
# suffixed with the Spark application id, so two bench processes on
# the same sf never share a mutable path.
# ---------------------------------------------------------------------------

_PRISTINE_FP_FILE = "_PRISTINE_FP"
_FIXTURE_FP_CACHE: "dict[str, str]" = {}

# ADVICE r14: appId-keyed fixture dirs never outlive their purpose but
# DID outlive their process, growing /tmp by ~5 pristine copies plus
# per-query work clones per bench/oracle invocation. Two mechanisms
# bound it: (a) every dir this process creates is removed at exit
# (precise, measurement-contract-neutral — the next process rebuilds
# from parquet anyway, exactly as before); (b) on the first fixture
# touch, dirs left by OTHER appIds that have aged past a grace window
# (crashed/killed runs whose atexit never fired) are swept. The grace
# keeps a concurrently-running process's fixtures safe.
_OWNED_FIXTURE_DIRS: "set[str]" = set()
_SWEEP_DONE = False
_SWEEP_GRACE_SEC = 2 * 3600.0


def _cleanup_owned_fixture_dirs() -> None:
    import shutil

    for d in list(_OWNED_FIXTURE_DIRS):
        shutil.rmtree(d, ignore_errors=True)


def _sweep_stale_fixture_dirs(sf_dir: str, app_id: str) -> None:
    global _SWEEP_DONE
    if _SWEEP_DONE:
        return
    _SWEEP_DONE = True
    import atexit
    import glob as _glob
    import os
    import shutil
    import tempfile
    import time

    atexit.register(_cleanup_owned_fixture_dirs)
    cutoff = time.time() - _SWEEP_GRACE_SEC
    me = _slugify(app_id)
    tmp = tempfile.gettempdir()
    patterns = (
        os.path.join(tmp, "impuls_pristine_*"),
        os.path.join(tmp, f"*_work_{_slugify(sf_dir)}_*"),
    )
    for pat in patterns:
        for d in _glob.glob(pat):
            try:
                if d.endswith(me) or not os.path.isdir(d):
                    continue
                if os.path.getmtime(d) < cutoff:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                continue


def _slugify(s: str) -> str:
    import re

    return re.sub(r"[^A-Za-z0-9._-]", "_", s)


def _fixture_fingerprint(builder: Callable) -> str:
    """Hash of the builder's own source plus the artifact-layer modules
    it drives — any code change invalidates the pristine copy."""
    key = builder.__name__
    fp = _FIXTURE_FP_CACHE.get(key)
    if fp is None:
        import hashlib
        import inspect

        from ..sources import corpus as _corpus_mod

        parts = [inspect.getsource(builder)]
        parts += [
            inspect.getsource(m)
            for m in (dedup, similarity, _corpus_mod)
        ]
        fp = hashlib.md5("".join(parts).encode()).hexdigest()
        _FIXTURE_FP_CACHE[key] = fp
    return fp


def _pristine_fixture(spark: SparkSession, sf_dir: str, builder) -> str:
    """Path of the build-once-PER-PROCESS pristine artifact for
    ``builder`` at this sf; (re)built when absent or when the
    fingerprint says the producing code changed.

    The path is keyed by the Spark ``applicationId`` so the artifact
    never outlives the invocation that built it: every bench/oracle
    process recomputes its indexes from the parquet inputs (once, then
    the in-process clones share it).  A path keyed only on the sf
    directory would let a second run skip the build entirely — cross-
    run precomputation, which the measurement contract forbids, and
    which would contaminate the driver's lower-core-count scaling runs
    with fixtures built at 32 cores."""
    import os
    import shutil
    import tempfile

    fp = _fixture_fingerprint(builder)
    app_id = spark.sparkContext.applicationId
    _sweep_stale_fixture_dirs(sf_dir, app_id)
    base = os.path.join(
        tempfile.gettempdir(),
        f"impuls_pristine_{builder.__name__.lstrip('_')}"
        f"_{_slugify(sf_dir)}_"
        + _slugify(app_id),
    )
    _OWNED_FIXTURE_DIRS.add(base)
    try:
        with open(os.path.join(base, _PRISTINE_FP_FILE)) as fh:
            if fh.read() == fp:
                return base
    except OSError:
        pass
    tmp = base + "." + _slugify(spark.sparkContext.applicationId)
    shutil.rmtree(tmp, ignore_errors=True)
    builder(spark, sf_dir, tmp)
    with open(os.path.join(tmp, _PRISTINE_FP_FILE), "w") as fh:
        fh.write(fp)
    shutil.rmtree(base, ignore_errors=True)
    try:
        os.rename(tmp, base)
    except OSError:
        return tmp  # another process published first; ours is equivalent
    return base


def _cloned_fixture(
    spark: SparkSession, sf_dir: str, qname: str, builder
) -> str:
    """Clone the pristine artifact to a per-process working path the
    query may mutate freely: appends/retrains/takedowns never
    accumulate across bench reps, and concurrent processes on the same
    sf never share a working dir (ADVICE r13)."""
    import os
    import shutil
    import tempfile

    src = _pristine_fixture(spark, sf_dir, builder)
    dst = os.path.join(
        tempfile.gettempdir(),
        f"{qname}_work_{_slugify(sf_dir)}_"
        + _slugify(spark.sparkContext.applicationId),
    )
    _OWNED_FIXTURE_DIRS.add(dst)
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)
    os.remove(os.path.join(dst, _PRISTINE_FP_FILE))
    return dst


def _build_didx_tracked_mod3(spark, sf_dir, path) -> None:
    """d69's pristine: provenance-tracked DedupIndex over doc_id%3==0."""
    docs = _docs_wide(spark, sf_dir).select("doc_id", "text")
    dedup.DedupIndex.build(
        docs.filter(F.col("doc_id") % 3 == 0), path, track_ids=True
    )


def _build_didx_mod2(spark, sf_dir, path) -> None:
    """d74's pristine: DedupIndex over the even half of the corpus."""
    docs = _docs_wide(spark, sf_dir).select("doc_id", "text")
    dedup.DedupIndex.build(docs.filter(F.col("doc_id") % 2 == 0), path)


def _build_ann_even(spark, sf_dir, path) -> None:
    """d68/d70/d73's shared pristine: cells-only AnnIndex over the
    even-id embeddings against the vec_id<4 anchors."""
    emb = _emb(spark, sf_dir)
    similarity.AnnIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") < 4),
        with_pq=False,
    ).save(path)


def _build_shards16(spark, sf_dir, path) -> None:
    """d71's pristine: the 16-way deterministic hash-shard layout."""
    from ..sources.corpus import write_training_shards

    write_training_shards(
        _docs(spark, sf_dir).select("doc_id", "text"), path, n_shards=16
    )


def _build_corpus_lang(spark, sf_dir, path) -> None:
    """d72's pristine: the lang-partitioned, id-sorted hive corpus."""
    from ..sources.corpus import write_corpus

    write_corpus(
        _docs(spark, sf_dir).select("doc_id", "text", "lang"),
        path, partition_by=("lang",), sort_by=("doc_id",),
    )


# ---------------------------------------------------------------------------
# d67 — persisted incremental dedup index (build -> save -> load ->
# ingest day 1 -> classify day 2 against the appended state)
# ---------------------------------------------------------------------------

_B1_FRESH = ("'fresh b1 crawl document ' || doc_id || "
             "' payload alpha beta gamma delta epsilon'")


def d67_dedup_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-N ingest pattern (VERDICT r8 item 1): the corpus's LSH
    index state lives in parquet (DedupIndex), batch 1 is classified
    THROUGH a freshly-loaded handle and its survivors appended, batch 2
    is classified by ANOTHER load of the on-disk state — so 'exact'/
    'near' verdicts on batch 2 docs that re-crawl batch 1's accepted
    docs prove the append, and the oracle proves incremental ==
    classify-against-(corpus ∪ survivors(b1)). Corpus text is never
    rescanned after build."""
    import os
    import re
    import tempfile

    from ..llm.dedup import DedupIndex

    docs = _docs_wide(spark, sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    fresh1 = F.concat(
        F.lit("fresh b1 crawl document "), F.col("doc_id").cast("string"),
        F.lit(" payload alpha beta gamma delta epsilon"),
    )
    b1 = (
        docs.filter(F.col("doc_id") % 6 == 0)       # re-crawls -> exact
        .select((F.col("doc_id") + 7000000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 3 == 1)   # fresh -> novel
            .select((F.col("doc_id") + 8000000).alias("doc_id"),
                    fresh1.alias("text"))
        )
    )
    b2 = (
        # verbatim re-crawl of b1's accepted docs -> exact VIA THE APPEND
        docs.filter(F.col("doc_id") % 3 == 1)
        .select((F.col("doc_id") + 9000000).alias("doc_id"),
                fresh1.alias("text"))
        .unionByName(
            # near-edit of b1's accepted docs -> near via appended bands
            docs.filter(F.col("doc_id") % 3 == 1)
            .select((F.col("doc_id") + 9500000).alias("doc_id"),
                    F.concat(fresh1, F.lit(" extrawordZZZ")).alias("text"))
        )
        .unionByName(
            # genuinely new -> novel
            docs.filter(F.col("doc_id") % 3 == 2)
            .select((F.col("doc_id") + 10000000).alias("doc_id"),
                    F.concat(F.lit("second day document "),
                             F.col("doc_id").cast("string"),
                             F.lit(" body zeta eta theta iota kappa"))
                    .alias("text"))
        )
    )
    # fixed per-sf path, REBUILT each call (build overwrites both
    # artifact dirs), so bench reps don't accumulate appends
    path = os.path.join(
        tempfile.gettempdir(),
        "d67_didx_" + re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir),
    )
    DedupIndex.build(corpus, path)
    idx = DedupIndex.load(spark, path)
    s1 = idx.ingest(b1)                       # appends b1's novel docs
    s2 = DedupIndex.load(spark, path).classify(b2)
    return (
        s1.select(F.lit("b1").alias("batch"), "doc_id", "status")
        .unionByName(
            s2.select(F.lit("b2").alias("batch"), "doc_id", "status")
        )
    )


D67_SQL = f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
b1 AS (
  SELECT doc_id + 7000000 AS doc_id, text FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id + 8000000, {_B1_FRESH}
  FROM documents WHERE doc_id % 3 = 1
),
exact1 AS (
  SELECT b.doc_id FROM b1 b
  WHERE md5(b.text) IN (SELECT md5(text) FROM corpus)
),
rest1 AS (SELECT * FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM exact1)),
{_band_sql("rest1")},
{_band_sql("corpus")},
near1 AS (
  SELECT DISTINCT r.doc_id FROM bands_rest1 r
  WHERE EXISTS (SELECT 1 FROM bands_corpus c
                WHERE c.band = r.band AND c.key = r.key)
),
s1 AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (SELECT doc_id FROM exact1) THEN 'exact'
              WHEN doc_id IN (SELECT doc_id FROM near1) THEN 'near'
              ELSE 'novel' END AS status
  FROM b1
),
-- the post-append index state: corpus plus batch-1 survivors
idx2 AS (
  SELECT doc_id, text FROM corpus
  UNION ALL
  SELECT b.doc_id, b.text FROM b1 b
  JOIN s1 USING (doc_id) WHERE s1.status = 'novel'
),
b2 AS (
  SELECT doc_id + 9000000 AS doc_id, {_B1_FRESH} AS text
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id + 9500000, {_B1_FRESH} || ' extrawordZZZ'
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id + 10000000,
         'second day document ' || doc_id || ' body zeta eta theta iota kappa'
  FROM documents WHERE doc_id % 3 = 2
),
exact2 AS (
  SELECT b.doc_id FROM b2 b
  WHERE md5(b.text) IN (SELECT md5(text) FROM idx2)
),
rest2 AS (SELECT * FROM b2 WHERE doc_id NOT IN (SELECT doc_id FROM exact2)),
{_band_sql("rest2")},
{_band_sql("idx2")},
near2 AS (
  SELECT DISTINCT r.doc_id FROM bands_rest2 r
  WHERE EXISTS (SELECT 1 FROM bands_idx2 c
                WHERE c.band = r.band AND c.key = r.key)
)
SELECT 'b1' AS batch, doc_id, status FROM s1
UNION ALL
SELECT 'b2', doc_id,
       CASE WHEN doc_id IN (SELECT doc_id FROM exact2) THEN 'exact'
            WHEN doc_id IN (SELECT doc_id FROM near2) THEN 'near'
            ELSE 'novel' END
FROM b2
"""


# ---------------------------------------------------------------------------
# d69 — DedupIndex takedown (VERDICT r9 item 4): a tracked index after
# remove(ids) classifies EXACTLY like an index over the surviving
# corpus — rows shared with survivors survive, removed content becomes
# re-acceptable
# ---------------------------------------------------------------------------

def d69_dedup_index_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a provenance-tracked index (track_ids=True), ingest a
    fresh batch, then REMOVE half the corpus docs and half the
    batch-accepted docs (takedown/licensing), and classify probes
    through a fresh load. The oracle is the structural contract:
    remove(ids) ≡ an index built over the surviving documents — a hash
    or band bucket shared with a survivor survives through the
    survivor's own row, removed content classifies novel again. The
    tracked index comes from the shared pristine fixture (VERDICT r13
    item 2) — the measured body is ingest -> remove -> classify."""
    from ..llm.dedup import DedupIndex

    docs = _docs_wide(spark, sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    fresh1 = F.concat(
        F.lit("fresh b1 crawl document "), F.col("doc_id").cast("string"),
        F.lit(" payload alpha beta gamma delta epsilon"),
    )
    b1 = (
        docs.filter(F.col("doc_id") % 6 == 0)       # re-crawls -> exact
        .select((F.col("doc_id") + 7000000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 3 == 1)   # fresh -> novel
            .select((F.col("doc_id") + 8000000).alias("doc_id"),
                    fresh1.alias("text"))
        )
    )
    probes = (
        # re-crawl of REMOVED corpus docs -> novel unless a survivor
        # shares the text (the oracle decides per doc)
        docs.filter(F.col("doc_id") % 6 == 0)
        .select((F.col("doc_id") + 9000000).alias("doc_id"), "text")
        .unionByName(                       # surviving corpus -> exact
            docs.filter(F.col("doc_id") % 6 == 3)
            .select((F.col("doc_id") + 9300000).alias("doc_id"), "text")
        )
        .unionByName(                       # removed b1 fresh docs
            docs.filter(F.col("doc_id") % 6 == 1)
            .select((F.col("doc_id") + 9600000).alias("doc_id"),
                    fresh1.alias("text"))
        )
        .unionByName(                       # near-edit of surviving b1
            docs.filter(F.col("doc_id") % 6 == 4)
            .select((F.col("doc_id") + 9900000).alias("doc_id"),
                    F.concat(fresh1, F.lit(" extrawordZZZ")).alias("text"))
        )
    )
    path = _cloned_fixture(
        spark, sf_dir, "d69_didx", _build_didx_tracked_mod3
    )
    idx = DedupIndex.load(spark, path)
    s1 = idx.ingest(b1)
    removed = (
        corpus.filter(F.col("doc_id") % 6 == 0).select("doc_id")
        .unionByName(
            s1.filter(
                (F.col("status") == "novel")
                & ((F.col("doc_id") - 8000000) % 6 == 1)
            ).select("doc_id")
        )
    )
    idx.remove(removed)
    s2 = DedupIndex.load(spark, path).classify(probes)
    return (
        s1.select(F.lit("b1").alias("batch"), "doc_id", "status")
        .unionByName(
            s2.select(F.lit("probe").alias("batch"), "doc_id", "status")
        )
    )


D69_SQL = f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
b1 AS (
  SELECT doc_id + 7000000 AS doc_id, text FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id + 8000000, {_B1_FRESH}
  FROM documents WHERE doc_id % 3 = 1
),
exact1 AS (
  SELECT b.doc_id FROM b1 b
  WHERE md5(b.text) IN (SELECT md5(text) FROM corpus)
),
rest1 AS (SELECT * FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM exact1)),
{{band_rest1}},
{{band_corpus}},
near1 AS (
  SELECT DISTINCT r.doc_id FROM bands_rest1 r
  WHERE EXISTS (SELECT 1 FROM bands_corpus c
                WHERE c.band = r.band AND c.key = r.key)
),
s1 AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (SELECT doc_id FROM exact1) THEN 'exact'
              WHEN doc_id IN (SELECT doc_id FROM near1) THEN 'near'
              ELSE 'novel' END AS status
  FROM b1
),
-- the post-takedown index state: surviving corpus docs plus surviving
-- batch-1 accepted docs (remove(ids) == rebuild over survivors)
idx2 AS (
  SELECT doc_id, text FROM corpus WHERE doc_id % 6 != 0
  UNION ALL
  SELECT b.doc_id, b.text FROM b1 b
  JOIN s1 USING (doc_id)
  WHERE s1.status = 'novel' AND (b.doc_id - 8000000) % 6 != 1
),
probes AS (
  SELECT doc_id + 9000000 AS doc_id, text
  FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id + 9300000, text FROM documents WHERE doc_id % 6 = 3
  UNION ALL
  SELECT doc_id + 9600000, {_B1_FRESH}
  FROM documents WHERE doc_id % 6 = 1
  UNION ALL
  SELECT doc_id + 9900000, {_B1_FRESH} || ' extrawordZZZ'
  FROM documents WHERE doc_id % 6 = 4
),
exact2 AS (
  SELECT b.doc_id FROM probes b
  WHERE md5(b.text) IN (SELECT md5(text) FROM idx2)
),
rest2 AS (
  SELECT * FROM probes WHERE doc_id NOT IN (SELECT doc_id FROM exact2)
),
{{band_rest2}},
{{band_idx2}},
near2 AS (
  SELECT DISTINCT r.doc_id FROM bands_rest2 r
  WHERE EXISTS (SELECT 1 FROM bands_idx2 c
                WHERE c.band = r.band AND c.key = r.key)
)
SELECT 'b1' AS batch, doc_id, status FROM s1
UNION ALL
SELECT 'probe', doc_id,
       CASE WHEN doc_id IN (SELECT doc_id FROM exact2) THEN 'exact'
            WHEN doc_id IN (SELECT doc_id FROM near2) THEN 'near'
            ELSE 'novel' END
FROM probes
""".format(
    band_rest1=_band_sql("rest1"),
    band_corpus=_band_sql("corpus"),
    band_rest2=_band_sql("rest2"),
    band_idx2=_band_sql("idx2"),
)


# ---------------------------------------------------------------------------
# d68 — AnnIndex incremental append (day-N vector ingest: route new
# vectors to the EXISTING anchors, no re-clustering; the ANN twin of
# d67's dedup-index ingest)
# ---------------------------------------------------------------------------

def d68_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a cells-only AnnIndex over the even-id half of the
    embeddings, save it, then APPEND the odd-id half through a freshly
    loaded handle (writing the new cells to the same artifact path) and
    return the cells of a SECOND load — so the output proves the
    on-disk append: every vector routed to the day-0 anchors, appended
    rows indistinguishable from built rows. The day-0 index comes from
    the shared pristine fixture (VERDICT r13 item 2) — the measured
    body is load -> append -> reload, not the rebuild."""
    emb = _emb(spark, sf_dir)
    day0 = emb.filter(F.col("vec_id") % 2 == 0)
    day1 = emb.filter(F.col("vec_id") % 2 == 1)
    anchors = emb.filter(F.col("vec_id") < 4)
    path = _cloned_fixture(spark, sf_dir, "d68_annidx", _build_ann_even)
    idx = similarity.AnnIndex.load(spark, path, day0, anchors)
    idx.append(day1, path=path)
    final = similarity.AnnIndex.load(spark, path, emb, anchors)
    return final.cells.select("vec_id", "anchor_id")


D68_SQL = """
WITH anchors AS (SELECT vec_id AS anchor_id, embedding
                 FROM embeddings WHERE vec_id < 4),
assign AS (
  SELECT vec_id, anchor_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, anchor_id) AS rn
  FROM (
    SELECT v.vec_id, a.anchor_id,
           round(
             list_sum(list_transform(range(1, 65),
                      i -> a.embedding[i]::double * v.embedding[i]::double))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> a.embedding[i]::double * a.embedding[i]::double)))
                * sqrt(list_sum(list_transform(range(1, 65),
                      i -> v.embedding[i]::double * v.embedding[i]::double)))),
           6) AS sim
    FROM embeddings v CROSS JOIN anchors a
  )
)
SELECT vec_id, anchor_id FROM assign WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# d70 — AnnIndex.retrain (VERDICT r9 item 3): after drifted appends the
# coarse quantizer is re-derived from the ACCRETED corpus (kmeans_fit),
# artifacts rewritten, anchors persisted — the oracle replays the
# deterministic k-means (d37's unrolled-iteration pattern, k=4) over
# the drifted union and the cosine re-assignment (d68's pattern)
# ---------------------------------------------------------------------------

def d70_ann_index_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a cells-only index on the even-id half, append the odd-id
    half DRIFTED (+5.0 on every component — a distribution the day-0
    anchors never saw), then retrain(path=...): anchors re-derived by
    k-means over day0 ∪ drifted, every vector re-assigned, artifacts
    rewritten, anchors stored with the index. The returned cells come
    from a fresh load that resolves the STORED anchors (no caller
    anchor frame) — proving the whole rewrite chain. The day-0 index is
    cloned from the shared pristine fixture (VERDICT r13 item 2): the
    clone starts every rep from a clean slate (no leftover retrain
    manifest) and the measured body is append -> retrain -> reload."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    day0 = emb.filter(F.col("vec_id") % 2 == 0)
    drifted = emb.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(5.0)).alias(
            "embedding"),
    )
    allv = day0.unionByName(drifted)
    anchors = emb.filter(F.col("vec_id") < 4)
    path = _cloned_fixture(spark, sf_dir, "d70_annidx", _build_ann_even)
    idx = similarity.AnnIndex.load(spark, path, day0, anchors)
    appended = idx.append(drifted, path=path)
    appended.retrain(path=path)          # k defaults to |anchors| = 4
    final = similarity.AnnIndex.load(spark, path, allv)  # stored anchors
    return final.cells.select("vec_id", "anchor_id")


def _d70_kmeans_iter(i: int) -> str:
    """One unrolled Lloyd iteration over the drifted corpus ``v``
    (d37's pattern at k=4): L2 argmin with lower-cid tiebreak, per-pos
    means, empty clusters keep the previous centroid."""
    prev = f"c{i - 1}"
    return f"""a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))),
                      c.cid) AS rn
    FROM v, {prev} c) WHERE rn = 1
),
m{i} AS (
  SELECT cid, pos, avg(x) AS m
  FROM (SELECT a.cid, unnest(range(1, 65)) AS pos, unnest(v.v) AS x
        FROM a{i} a JOIN v USING (vec_id))
  GROUP BY 1, 2
),
nc{i} AS (SELECT cid, list(m ORDER BY pos) AS c FROM m{i} GROUP BY cid),
c{i} AS (
  SELECT {prev}.cid, coalesce(nc{i}.c, {prev}.c) AS c
  FROM {prev} LEFT JOIN nc{i} USING (cid)
)"""


D70_SQL = """
WITH v AS (
  SELECT vec_id,
         CASE WHEN vec_id % 2 = 1
              THEN list_transform(embedding, x -> x::double + 5.0)
              ELSE list_transform(embedding, x -> x::double) END AS v
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS c FROM v WHERE vec_id < 4),
""" + ",\n".join(_d70_kmeans_iter(i) for i in (1, 2, 3)) + """,
-- kmeans_fit rounds the emitted centroids to 6 decimals; retrain's
-- anchor fold reuses those rounded values
anchors AS (
  SELECT cid AS anchor_id,
         list_transform(c, x -> round(x, 6)) AS a
  FROM c3
),
assign AS (
  SELECT vec_id, anchor_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, anchor_id) AS rn
  FROM (
    SELECT v.vec_id, an.anchor_id,
           round(
             list_sum(list_transform(range(1, 65),
                      i -> an.a[i] * v.v[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> an.a[i] * an.a[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                      i -> v.v[i] * v.v[i])))),
           6) AS sim
    FROM v CROSS JOIN anchors an
  )
)
SELECT vec_id, anchor_id FROM assign WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# d71 — training-shard takedown (VERDICT r10 item 1): remove_from_shards
# rewrites ONLY the shard directories the removed ids hash to; the
# returned per-shard manifest of the PHYSICAL post-takedown layout must
# equal the survivors sharded by the writer's hash law (the oracle
# re-derives md5-prefix shard assignment in SQL)
# ---------------------------------------------------------------------------

def d71_shard_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents table as 16 deterministic hash shards
    (``sources.write_training_shards``), take down every seventh
    document (``remove_from_shards`` — partition-pruned rewrite of
    only the affected shard dirs, marker-guarded), and read the layout
    BACK from disk into a per-shard manifest. Oracle: group the
    surviving documents by the same ``md5('shard:'||id)`` prefix — the
    physical layout after takedown must carry exactly the survivor set
    in exactly the writer's shard assignment.

    Scale shape: the takedown's cost is (affected shards) x (shard
    rewrite), never a corpus pass — removed ids name their directories
    through the hash law with no scan; see remove_from_shards. The
    shard layout is cloned from the pristine fixture (VERDICT r13
    item 2) so the measured body is the takedown + read-back."""
    from ..sources.corpus import read_training_shards, remove_from_shards

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    path = _cloned_fixture(spark, sf_dir, "d71_shards", _build_shards16)
    removed = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    remove_from_shards(spark, path, removed)
    return (
        read_training_shards(spark, path)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


D71_SQL = """
SELECT substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
       count(*) AS n_docs,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id
FROM documents
WHERE doc_id % 7 != 0
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# d72 — corpus takedown (remove_from_corpus): partition-pruned rewrite
# of a hive corpus, with a whole language removed so its emptied
# partition DIRECTORY disappears from the physical layout (dynamic
# overwrite alone would have left it — the read-back proves the delete)
# ---------------------------------------------------------------------------

def d72_corpus_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents table as a lang-partitioned corpus, take
    down ALL documents of one language plus every eleventh id
    (``sources.remove_from_corpus``), and read the corpus back into a
    per-language manifest. The removed language's partition is emptied
    and its directory deleted, so it is absent from the read-back —
    the oracle is the survivor set grouped by lang. The corpus layout
    is cloned from the pristine fixture (VERDICT r13 item 2) so the
    measured body is the takedown + read-back."""
    from ..sources.corpus import read_corpus, remove_from_corpus

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    path = _cloned_fixture(spark, sf_dir, "d72_corpus", _build_corpus_lang)
    victim = "de"
    removed = docs.filter(
        (F.col("lang") == victim) | (F.col("doc_id") % 11 == 0)
    ).select("doc_id")
    remove_from_corpus(spark, path, removed, partition_by=("lang",))
    return (
        read_corpus(spark, path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum(F.length("text")).alias("n_chars"),
        )
    )


D72_SQL = """
SELECT lang,
       count(*) AS n_docs,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM documents
WHERE lang != 'de' AND doc_id % 11 != 0
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# d73 — streaming-vector takedown (streaming.takedown_stream_vectors):
# absorb the stream sidecars into the flat artifacts, purge the removed
# ids, leave the next ingest restart clean (VERDICT r11 item 4)
# ---------------------------------------------------------------------------

def d73_vector_stream_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a cells-only AnnIndex over the even-id embeddings and
    save it; land the odd-id half as TWO stream-sidecar epochs exactly
    the way ``ingest_vectors`` writes them (epoch-partitioned
    assignments against the stored anchors); then run
    ``takedown_stream_vectors`` for every id divisible by 10 — one
    marker-guarded pass that absorbs both epochs into the flat layout
    and purges the removed ids. The returned cells of a fresh load
    prove all three effects at once: streamed rows present, removed
    ids absent, stream sidecars folded (a load would fail fast if a
    marker or crashed epoch were left). Oracle: the d68 cosine
    assignment over the surviving ids. The day-0 index is cloned from
    the shared pristine fixture (VERDICT r13 item 2); the epoch
    sidecar writes stay in-query — they ARE the streamed state under
    test."""
    from ..streaming import takedown_stream_vectors
    from ..streaming.compact import EPOCH_COL

    emb = _emb(spark, sf_dir)
    day0 = emb.filter(F.col("vec_id") % 2 == 0)
    day1 = emb.filter(F.col("vec_id") % 2 == 1)
    anchors = emb.filter(F.col("vec_id") < 4)
    path = _cloned_fixture(
        spark, sf_dir, "d73_annstream", _build_ann_even
    )
    # two committed epochs, written with the sink's own layout
    for epoch, half in ((0, day1.filter(F.col("vec_id") % 4 == 1)),
                        (1, day1.filter(F.col("vec_id") % 4 == 3))):
        (
            similarity.ivf_assign(half, anchors)
            .withColumn(EPOCH_COL, F.lit(epoch))
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(EPOCH_COL)
            .parquet(f"{path}/stream/cells")
        )
    removed = day0.unionByName(day1).filter(
        F.col("vec_id") % 10 == 0
    ).select("vec_id")
    takedown_stream_vectors(spark, path, removed, assume_stopped=True)
    final = similarity.AnnIndex.load(spark, path, emb, anchors)
    return final.cells.select("vec_id", "anchor_id")


D73_SQL = """
WITH anchors AS (SELECT vec_id AS anchor_id, embedding
                 FROM embeddings WHERE vec_id < 4),
assign AS (
  SELECT vec_id, anchor_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, anchor_id) AS rn
  FROM (
    SELECT v.vec_id, a.anchor_id,
           round(
             list_sum(list_transform(range(1, 65),
                      i -> a.embedding[i]::double * v.embedding[i]::double))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> a.embedding[i]::double * a.embedding[i]::double)))
                * sqrt(list_sum(list_transform(range(1, 65),
                      i -> v.embedding[i]::double * v.embedding[i]::double)))),
           6) AS sim
    FROM embeddings v CROSS JOIN anchors a
  )
)
SELECT vec_id, anchor_id FROM assign WHERE rn = 1 AND vec_id % 10 != 0
"""


# ---------------------------------------------------------------------------
# d74 — OVER-PARQUET_IN_MAX backfill classify (r13): a batch of
# 3x|documents| exceeds PARQUET_IN_MAX (1000, set from PROBE_CAP.json)
# at every graded sf, so the micro-batch probe's isin runs in the
# MIDDLE regime — exact Catalyst InSet at the scan, parquet threshold
# left alone so the reader converts the In to its native [min,max]
# range instead of the Or-chain that StackOverflows. Oracle-gated so
# the degraded regime is correctness-checked, not just unit-tested.
# ---------------------------------------------------------------------------

def d74_backfill_span_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify a backfill THREE TIMES the corpus size (verbatim
    re-crawls of the indexed half -> exact, one-token edits -> near
    via band collisions, synthetic fresh docs -> novel) through a
    loaded DedupIndex with the micro-batch join mode. At every graded
    sf the batch's distinct key count exceeds PARQUET_IN_MAX, so this
    query proves the degraded probe regime end to end: the In is never
    admitted past the parquet threshold (no StackOverflow exposure),
    the scan carries the chunked span predicate with an exact InSet
    row filter, and the semi-join keeps the verdicts exact. The index
    over the even half is cloned from the pristine fixture (VERDICT
    r13 item 2) — the measured body is the over-cap probe itself."""
    from ..llm.dedup import DedupIndex

    docs = _docs_wide(spark, sf_dir).select("doc_id", "text")
    # the batch stays 3x the FULL corpus so its distinct key count
    # exceeds the cap at every graded sf (1500 at sf0.01) — even-doc
    # re-crawls land 'exact', odd-doc re-crawls 'novel'
    backfill = (
        docs.select((F.col("doc_id") + 7000000).alias("doc_id"), "text")
        .unionByName(docs.select(
            (F.col("doc_id") + 8000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extrawordZZZ")).alias("text"),
        ))
        .unionByName(docs.select(
            (F.col("doc_id") + 9000000).alias("doc_id"),
            F.concat(F.lit("backfill doc "), F.col("doc_id").cast("string"),
                     F.lit(" fresh alpha beta gamma")).alias("text"),
        ))
    )
    path = _cloned_fixture(spark, sf_dir, "d74_didx", _build_didx_mod2)
    return DedupIndex.load(spark, path).classify(
        backfill, broadcast_new=True
    )


_D74_BATCH_SQL = """
  SELECT doc_id + 7000000 AS doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 8000000, text || ' extrawordZZZ' FROM documents
  UNION ALL
  SELECT doc_id + 9000000,
         'backfill doc ' || doc_id || ' fresh alpha beta gamma'
  FROM documents
"""

D74_SQL = f"""
WITH corpus74 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
backfill AS ({_D74_BATCH_SQL}),
exact AS (
  SELECT b.doc_id FROM backfill b
  WHERE md5(b.text) IN (SELECT md5(text) FROM corpus74)
),
rest AS (
  SELECT * FROM backfill WHERE doc_id NOT IN (SELECT doc_id FROM exact)
),
{_band_sql("rest")},
{_band_sql("corpus74")},
near AS (
  SELECT DISTINCT r.doc_id
  FROM bands_rest r
  WHERE EXISTS (SELECT 1 FROM bands_corpus74 c
                WHERE c.band = r.band AND c.key = r.key)
)
SELECT b.doc_id,
       CASE WHEN b.doc_id IN (SELECT doc_id FROM exact) THEN 'exact'
            WHEN b.doc_id IN (SELECT doc_id FROM near) THEN 'near'
            ELSE 'novel' END AS status
FROM backfill b
"""


# ---------------------------------------------------------------------------
# d75 — ANN capacity plan (r14): the corpus-scaled IVF-PQ
# configuration law (similarity.ann_capacity — cells ~ sqrt(n), probe
# ~ cells/8, codebook width from the margin*n code-space bound),
# derived IN-PLAN from the corpus count and oracle-gated so the
# arithmetic that sizes every capacity-built index is itself
# correctness-checked against an independent engine. The law exists
# because fixed codebooks collide as the corpus grows (recall@10
# 0.155 -> 0.01 at 500 -> 20k vectors, RECALL.json r14).
# ---------------------------------------------------------------------------

def d75_ann_capacity_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One plan row per corpus: count the embeddings table, then
    derive the full :func:`impuls_spark.llm.similarity.ann_capacity`
    configuration with the Column-expression twin
    (``ann_capacity_columns``) — one agg job, plan columns computed
    inside Catalyst, zero driver round-trips. ``code_space_log2``
    (= m * log2(pq_k), exact for power-of-two pq_k) and the raw-float
    vs PQ-code ``compression_x`` ride along as the two numbers a
    capacity review actually reads."""
    from ..llm.similarity import ann_capacity_columns

    base = _emb(spark, sf_dir).agg(
        F.count("*").alias("n_vectors"))
    cols = ann_capacity_columns(F.col("n_vectors"), dim=64)
    return base.select(
        F.col("n_vectors"),
        F.lit(64).alias("dim"),
        cols["n_cells"].alias("n_cells"),
        cols["n_probe"].alias("n_probe"),
        cols["m"].alias("m"),
        cols["pq_k"].alias("pq_k"),
        (cols["m"].cast("double")
         * F.log2(cols["pq_k"].cast("double"))).cast("int").alias(
            "code_space_log2"),
        F.round(F.lit(64 * 4.0) / cols["m"].cast("double"), 2).alias(
            "compression_x"),
    )


D75_SQL = """
WITH base AS (
  SELECT count(*)::bigint AS n_vectors FROM embeddings
),
c1 AS (
  SELECT n_vectors, 64 AS dim,
         least(n_vectors,
               greatest(4, ceil(sqrt(n_vectors))::bigint))::int
           AS n_cells,
         n_vectors * 16.0 AS mn
  FROM base
),
c2 AS (
  SELECT n_vectors, dim, n_cells,
         least(n_cells::bigint,
               greatest(2, ceil(n_cells / 8.0)::bigint))::int
           AS n_probe,
         -- m = max(resolution 16 for dim 64, collision divisor)
         greatest(16,
           CASE WHEN power(256, 4) >= mn THEN 4
                WHEN power(256, 8) >= mn THEN 8
                WHEN power(256, 16) >= mn THEN 16
                ELSE 32 END) AS m,
         mn
  FROM c1
),
c3 AS (
  SELECT n_vectors, dim, n_cells, n_probe, m,
         least(
           greatest(16,
             CASE WHEN power(4, m) >= mn THEN 4
                  WHEN power(8, m) >= mn THEN 8
                  WHEN power(16, m) >= mn THEN 16
                  WHEN power(32, m) >= mn THEN 32
                  WHEN power(64, m) >= mn THEN 64
                  WHEN power(128, m) >= mn THEN 128
                  ELSE 256 END)::double,
           greatest(4.0, power(2, floor(log2(n_vectors))))
         )::int AS pq_k
  FROM c2
)
SELECT n_vectors, dim, n_cells, n_probe, m, pq_k,
       (m * log2(pq_k))::int AS code_space_log2,
       round(64 * 4.0 / m, 2) AS compression_x
FROM c3
"""


# ---------------------------------------------------------------------------
# d76 — ANN quantizer training sample (r14): the evenly-spaced rank
# sample build_auto trains its Lloyd anchors and PQ codebooks on
# (similarity._evenly_spaced over distributed_row_number, global
# span), sized by the capacity law's cell count. Oracle-gated so the
# sampling arithmetic — the rows every capacity-built quantizer
# learns from — is itself correctness-checked row for row.
# ---------------------------------------------------------------------------

def d76_ann_train_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ids of the quantizer-training sample for this corpus at 4
    rows per cell (the graded-sf miniature of ``build_auto``'s
    256/cell default — 256 would select every row at the oracle
    sizes, making the check vacuous). One bounded scalar count sizes
    the stride; the sample itself is one global-span rank pass with
    no single-partition stage."""
    from ..llm import similarity

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    n = emb.count()
    cap = similarity.ann_capacity(n, 64)
    target = cap.n_cells * 4
    return similarity._evenly_spaced(
        emb, target, "vec_id", "embedding", n=n
    ).select("vec_id")


D76_SQL = """
WITH base AS (
  SELECT count(*)::bigint AS n FROM embeddings
),
cap AS (
  SELECT n,
         least(n, greatest(4, ceil(sqrt(n))::bigint))::bigint AS n_cells
  FROM base
),
p AS (
  SELECT n, n_cells * 4 AS target,
         greatest(1, floor(n / (n_cells * 4.0))::bigint) AS stride
  FROM cap
),
r AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
  FROM embeddings
)
SELECT r.vec_id
FROM r, p
WHERE (r.rn - 1) % p.stride = 0 AND r.rn <= p.stride * p.target
"""


# ---------------------------------------------------------------------------
# d59 — record linkage: LSH-blocked candidates verified by edit
# distance (llm/linkage.py; blocking = the shared d03 pair graph)
# ---------------------------------------------------------------------------

def d59_edit_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import linkage

    return linkage.edit_verified_pairs(
        _lsh_pairs_cached(spark, sf_dir),
        _docs(spark, sf_dir),
        min_sim=0.8,
    )


D59_SQL = f"""
WITH pairs AS ({D03_SQL}),
v AS (
  SELECT p.id_a, p.id_b,
         levenshtein(a.text, b.text) AS edit_dist,
         1.0 - levenshtein(a.text, b.text)
             / greatest(length(a.text), length(b.text), 1) AS sim
  FROM pairs p
  JOIN documents a ON a.doc_id = p.id_a
  JOIN documents b ON b.doc_id = p.id_b
)
SELECT id_a, id_b, edit_dist, round(sim, 6) AS edit_sim
FROM v WHERE sim >= 0.8
"""


# ---------------------------------------------------------------------------
# d60 — near-dup cluster curation: keep the best-quality member of
# each duplicate cluster (d14's components x d08's quality scores)
# ---------------------------------------------------------------------------

def d60_keep_best_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import curation

    clusters = dedup.duplicate_clusters(_lsh_pairs_cached(spark, sf_dir))
    scored = txt.quality_scores(_docs(spark, sf_dir))
    return curation.keep_best_per_cluster(clusters, scored)


D60_SQL = f"""
WITH RECURSIVE pairs AS ({D03_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst
),
clusters AS (
  SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
),
q AS ({D08_SQL}),
j AS (
  SELECT c.cluster_id, c.doc_id, q.quality_score
  FROM clusters c JOIN q USING (doc_id)
),
r AS (
  SELECT cluster_id, doc_id, quality_score,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality_score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members,
         max(quality_score) OVER (PARTITION BY cluster_id) AS kept_score
  FROM j
)
SELECT cluster_id, doc_id AS kept_id, kept_score, n_members
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# d61 — per-group score normalization (z-scored quality per language)
# ---------------------------------------------------------------------------

def _quality_scored_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality_scores ⋈ lang, persisted per session: d61 and d62 both
    consume it, and each of their plans references the frame twice
    (group statistic + row branch) — scoring once is also what a real
    pipeline does before normalize/threshold stages."""
    cache = _session_cache(spark)
    key = ("quality_scored", sf_dir)
    if key not in cache:
        docs = _docs(spark, sf_dir)
        cache[key] = (
            txt.quality_scores(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .persist()
        )
    return cache[key]


def d61_score_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import curation

    return curation.normalize_scores(
        _quality_scored_cached(spark, sf_dir), "quality_score", ["lang"]
    )


D61_SQL = f"""
WITH q AS ({D08_SQL}),
s AS (SELECT q.doc_id, d.lang, q.quality_score
      FROM q JOIN documents d USING (doc_id)),
st AS (SELECT lang, avg(quality_score) AS m, stddev(quality_score) AS sd
       FROM s GROUP BY lang)
SELECT s.doc_id, s.lang, s.quality_score,
       round(coalesce((s.quality_score - st.m) / nullif(st.sd, 0), 0), 6)
           AS score_norm
FROM s JOIN st USING (lang)
"""


# ---------------------------------------------------------------------------
# d62 — quantile-threshold curation (keep top 30% quality per language)
# ---------------------------------------------------------------------------

def d62_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import curation

    scored = _quality_scored_cached(spark, sf_dir).select(
        "doc_id", "lang", "quality_score"
    )
    return curation.quantile_filter(
        scored, "quality_score", ["lang"], q=0.7
    )


D62_SQL = f"""
WITH q AS ({D08_SQL}),
s AS (SELECT q.doc_id, d.lang, q.quality_score
      FROM q JOIN documents d USING (doc_id)),
t AS (SELECT lang, round(quantile_cont(quality_score, 0.7), 6) AS threshold
      FROM s GROUP BY lang)
SELECT s.doc_id, s.lang, s.quality_score, t.threshold
FROM s JOIN t USING (lang)
WHERE s.quality_score >= t.threshold
"""


def _force_noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


#: Shared per-session builds reused by several queries (the "pair-graph
#: family": d10/d18 and the shingle consumers, d02/d26 via the capped
#: overlap frame, d03 and through it d14/d29/d59 via the LSH pair
#: graph).  ``bench.py`` forces these ONCE before the timed query loop
#: and reports each build's cost separately, so in-suite per-query
#: numbers measure incremental work instead of charging the shared
#: build to whichever family member happens to run first (the d59
#: 53s-in-suite-vs-20s-isolated artifact, BASELINE.md r9/r10).  Order
#: matters: each entry builds on the previous one's cache.
#: Queries whose plans consume the shared builds above — bench.py
#: fires the prebuild immediately BEFORE the first of these in its run
#: order (NOT at loop start: at sf1 the memory-heavy artifact chains
#: that run in between evicted the early-built cache, and the first
#: consumer paid a full 52 s rebuild anyway — measured r10).
SHARED_BUILD_CONSUMERS = {
    "d10_fingerprints", "d18_decontaminate", "d02_ngram_jaccard",
    "d26_containment", "d03_minhash_lsh", "d14_dup_clusters",
    "d29_split_contamination", "d59_edit_linkage",
    "d35_incremental_dedup", "d60_keep_best_cluster",
}

SHARED_BUILDS: "dict[str, Callable[[SparkSession, str], None]]" = {
    "shingles": lambda spark, sf_dir: _force_noop(
        _shingles_cached(spark, sf_dir)),
    "overlap20": lambda spark, sf_dir: [
        _force_noop(f) for f in _overlap_parts_cached(spark, sf_dir)[:2]
    ] and None,
    "minhash_sigs": lambda spark, sf_dir: _force_noop(
        _signatures_cached(spark, sf_dir)),
    "lsh_pairs": lambda spark, sf_dir: _force_noop(
        _lsh_pairs_cached(spark, sf_dir)),
}

#: Per-FAMILY prebuild groups (VERDICT r12 item 6): each group's
#: builds fire immediately before its FIRST consumer in bench run
#: order, so every shared artifact is (re)built fresh next to the
#: block that uses it instead of rotating with in-suite memory
#: pressure (the d56 8.3s-in-suite-vs-3.2s-pinned placement slot —
#: its |D|xk cell assignment was rebuilt inside whichever of d56/d57
#: ran first after eviction). The pair-graph family keeps its r10
#: treatment as group one.
SHARED_BUILD_GROUPS: "list[dict]" = [
    {
        "name": "pair_graph",
        "consumers": SHARED_BUILD_CONSUMERS,
        "builds": SHARED_BUILDS,
        # each build extends the previous one's cache (shingles ->
        # overlap20 -> sigs -> pairs): the chain must stay sequential
        # (r14: unordered groups' builds run overlapped, guide §2.6)
        "ordered": True,
    },
    {
        "name": "ivf_cells",
        "consumers": {"d56_semantic_dedup", "d57_semdedup_centroid_far"},
        "builds": {
            "ivf_cells": lambda spark, sf_dir: _force_noop(
                _ivf_cells_cached(spark, sf_dir)),
        },
    },
    # VERDICT r13 item 2: warm the on-disk pristine artifacts the
    # lifecycle family clones, right before its first member, so the
    # in-suite per-query numbers measure the OPERATIONS (ingest /
    # append / retrain / takedown) — a cold round still builds each
    # pristine exactly once here, reported as its own line. d67 is
    # deliberately NOT a consumer: it keeps the cold in-query build so
    # build cost stays on the bench record.
    {
        "name": "lifecycle_fixtures",
        "consumers": {
            "d68_ann_index_append", "d69_dedup_index_takedown",
            "d70_ann_index_retrain", "d71_shard_takedown",
            "d72_corpus_takedown", "d73_vector_stream_takedown",
            "d74_backfill_span_classify",
        },
        "builds": {
            "pristine_ann_even": lambda spark, sf_dir: _pristine_fixture(
                spark, sf_dir, _build_ann_even) and None,
            "pristine_didx_tracked": lambda spark, sf_dir:
                _pristine_fixture(
                    spark, sf_dir, _build_didx_tracked_mod3) and None,
            "pristine_didx_mod2": lambda spark, sf_dir: _pristine_fixture(
                spark, sf_dir, _build_didx_mod2) and None,
            "pristine_shards16": lambda spark, sf_dir: _pristine_fixture(
                spark, sf_dir, _build_shards16) and None,
            "pristine_corpus_lang": lambda spark, sf_dir:
                _pristine_fixture(
                    spark, sf_dir, _build_corpus_lang) and None,
        },
    },
]


LLM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "d01_exact_dedup": d01_exact_dedup,
    "d02_ngram_jaccard": d02_ngram_jaccard,
    "d03_minhash_lsh": d03_minhash_lsh,
    "d04_simhash_neardup": d04_simhash_neardup,
    "d05_cosine_topk": d05_cosine_topk,
    "d06_ann_lsh_topk": d06_ann_lsh_topk,
    "d07_language_id": d07_language_id,
    "d08_quality_scores": d08_quality_scores,
    "d09_token_counts": d09_token_counts,
    "d10_fingerprints": d10_fingerprints,
    "d11_multimodal_decode": d11_multimodal_decode,
    "d12_ann_ivf_topk": d12_ann_ivf_topk,
    "d13_embedding_neardup": d13_embedding_neardup,
    "d14_dup_clusters": d14_dup_clusters,
    "d15_stratified_sample": d15_stratified_sample,
    "d16_vocab_df": d16_vocab_df,
    "d17_pack_sequences": d17_pack_sequences,
    "d18_decontaminate": d18_decontaminate,
    "d19_pii_scan": d19_pii_scan,
    "d20_quality_rules": d20_quality_rules,
    "d21_url_dedup": d21_url_dedup,
    "d22_bm25_rank": d22_bm25_rank,
    "d23_tfidf_keywords": d23_tfidf_keywords,
    "d24_bigram_lm": d24_bigram_lm,
    "d25_hash_split": d25_hash_split,
    "d26_containment": d26_containment,
    "d27_centroid_outliers": d27_centroid_outliers,
    "d28_budget_select": d28_budget_select,
    "d29_split_contamination": d29_split_contamination,
    "d30_mixture_rates": d30_mixture_rates,
    "d32_repetition": d32_repetition,
    "d33_ngram_novelty": d33_ngram_novelty,
    "d34_jsonl_roundtrip": d34_jsonl_roundtrip,
    "d35_incremental_dedup": d35_incremental_dedup,
    "d36_block_dedup": d36_block_dedup,
    "d37_kmeans": d37_kmeans,
    "d38_partitioned_corpus": d38_partitioned_corpus,
    "d39_length_quantiles": d39_length_quantiles,
    "d40_encoding_quality": d40_encoding_quality,
    "d41_duplicate_spans": d41_duplicate_spans,
    "d42_pq_codes": d42_pq_codes,
    "d43_ivfpq_topk": d43_ivfpq_topk,
    "d55_ivfpq_refined": d55_ivfpq_refined,
    "d56_semantic_dedup": d56_semantic_dedup,
    "d57_semdedup_centroid_far": d57_semantic_dedup_centroid,
    "d58_kmv_distinct": d58_kmv_distinct,
    "d63_kmv_merge": d63_kmv_merge,
    "d64_kmv_jaccard": d64_kmv_jaccard,
    "d65_media_resize": d65_media_resize,
    "d66_segment_dedup_first": d66_segment_dedup_first,
    "d67_dedup_index_ingest": d67_dedup_index_ingest,
    "d68_ann_index_append": d68_ann_index_append,
    "d69_dedup_index_takedown": d69_dedup_index_takedown,
    "d70_ann_index_retrain": d70_ann_index_retrain,
    "d71_shard_takedown": d71_shard_takedown,
    "d72_corpus_takedown": d72_corpus_takedown,
    "d73_vector_stream_takedown": d73_vector_stream_takedown,
    "d74_backfill_span_classify": d74_backfill_span_classify,
    "d75_ann_capacity_plan": d75_ann_capacity_plan,
    "d76_ann_train_sample": d76_ann_train_sample,
    "d59_edit_linkage": d59_edit_linkage,
    "d60_keep_best_cluster": d60_keep_best_cluster,
    "d61_score_normalize": d61_score_normalize,
    "d62_quantile_filter": d62_quantile_filter,
    "d44_snapshot_diff": d44_snapshot_diff,
    "d45_weighted_sample": d45_weighted_sample,
    "d46_bpe_pairs": d46_bpe_pairs,
    "d47_source_dup_rate": d47_source_dup_rate,
    "d48_shard_manifest": d48_shard_manifest,
    "d49_fixed_len_chunks": d49_fixed_len_chunks,
    "d50_inverted_index": d50_inverted_index,
    "d51_normalize_text": d51_normalize_text,
    "d52_training_order": d52_training_order,
    "d53_source_cap": d53_source_cap,
}

LLM_ORACLES: dict[str, str] = {
    "d01_exact_dedup": D01_SQL,
    "d02_ngram_jaccard": D02_SQL,
    "d03_minhash_lsh": D03_SQL,
    "d04_simhash_neardup": D04_SQL,
    "d05_cosine_topk": D05_SQL,
    "d06_ann_lsh_topk": D06_SQL,
    "d07_language_id": D07_SQL,
    "d08_quality_scores": D08_SQL,
    "d09_token_counts": D09_SQL,
    "d10_fingerprints": D10_SQL,
    "d11_multimodal_decode": D11_SQL,
    "d12_ann_ivf_topk": D12_SQL,
    "d13_embedding_neardup": D13_SQL,
    "d14_dup_clusters": D14_SQL,
    "d15_stratified_sample": D15_SQL,
    "d16_vocab_df": D16_SQL,
    "d17_pack_sequences": D17_SQL,
    "d18_decontaminate": D18_SQL,
    "d19_pii_scan": D19_SQL,
    "d20_quality_rules": D20_SQL,
    "d21_url_dedup": D21_SQL,
    "d22_bm25_rank": D22_SQL,
    "d23_tfidf_keywords": D23_SQL,
    "d24_bigram_lm": D24_SQL,
    "d25_hash_split": D25_SQL,
    "d26_containment": D26_SQL,
    "d27_centroid_outliers": D27_SQL,
    "d28_budget_select": D28_SQL,
    "d29_split_contamination": D29_SQL,
    "d30_mixture_rates": D30_SQL,
    "d32_repetition": D32_SQL,
    "d33_ngram_novelty": D33_SQL,
    "d34_jsonl_roundtrip": D34_SQL,
    "d35_incremental_dedup": D35_SQL,
    "d36_block_dedup": D36_SQL,
    "d37_kmeans": D37_SQL,
    "d38_partitioned_corpus": D38_SQL,
    "d39_length_quantiles": D39_SQL,
    "d40_encoding_quality": _d40_sql(),
    "d41_duplicate_spans": D41_SQL,
    "d42_pq_codes": D42_SQL,
    "d43_ivfpq_topk": D43_SQL,
    "d55_ivfpq_refined": D55_SQL,
    "d56_semantic_dedup": D56_SQL,
    "d57_semdedup_centroid_far": D57_SQL,
    "d58_kmv_distinct": D58_SQL,
    "d63_kmv_merge": D63_SQL,
    "d64_kmv_jaccard": D64_SQL,
    "d65_media_resize": D65_SQL,
    "d66_segment_dedup_first": D66_SQL,
    "d67_dedup_index_ingest": D67_SQL,
    "d68_ann_index_append": D68_SQL,
    "d69_dedup_index_takedown": D69_SQL,
    "d70_ann_index_retrain": D70_SQL,
    "d71_shard_takedown": D71_SQL,
    "d72_corpus_takedown": D72_SQL,
    "d73_vector_stream_takedown": D73_SQL,
    "d74_backfill_span_classify": D74_SQL,
    "d75_ann_capacity_plan": D75_SQL,
    "d76_ann_train_sample": D76_SQL,
    "d59_edit_linkage": D59_SQL,
    "d60_keep_best_cluster": D60_SQL,
    "d61_score_normalize": D61_SQL,
    "d62_quantile_filter": D62_SQL,
    "d44_snapshot_diff": D44_SQL,
    "d45_weighted_sample": D45_SQL,
    "d46_bpe_pairs": D46_SQL,
    "d47_source_dup_rate": D47_SQL,
    "d48_shard_manifest": D48_SQL,
    "d49_fixed_len_chunks": D49_SQL,
    "d50_inverted_index": D50_SQL,
    "d51_normalize_text": D51_SQL,
    "d52_training_order": D52_SQL,
    "d53_source_cap": D53_SQL,
}
