"""Corpus-curation operators: benchmark decontamination, PII scanning
and redaction, Gopher/C4-style quality rules, and URL canonicalization
with keep-best dedup.

100 TB design rules, same as the rest of ``impuls_spark.llm``:

- decontamination broadcasts the (small) eval n-gram set, so the
  train-side scan is a map-side semi-join; the only shuffle is the
  per-document overlap aggregation;
- PII and quality rules are pure column expressions — one codegen'd
  pass over the text column, no Python, no shuffle;
- URL dedup is a single hash aggregation on the canonical key with
  map-side partial ``min``/``max`` (no window sort).

Regex patterns stay in the common Java-regex / RE2 subset (no
lookaround, no backreferences) so the DuckDB oracles match
bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_overlap: int = 5,
    train_shingles: DataFrame | None = None,
) -> DataFrame:
    """Flag training documents that share ``>= min_overlap`` distinct
    word ``shingle_n``-grams with any document in ``eval_df`` (the
    benchmark / eval corpus).

    Returns (id, n_overlap) for flagged documents only — the common
    "decontamination report" shape; anti-join it back onto ``train``
    to drop the hits.

    Scale: eval corpora are tiny next to a 100 TB crawl, so the eval
    n-gram set is broadcast and the train shingle stream never
    shuffles for the join; the single exchange is the final
    per-document count. Pass ``train_shingles`` to reuse a shared
    shingling pass.
    """
    from .dedup import word_shingles

    tr = (
        train_shingles
        if train_shingles is not None
        else word_shingles(train, text_col, id_col, n=shingle_n)
    )
    ev = word_shingles(eval_df, text_col, id_col, n=shingle_n).select(
        "shingle"
    ).distinct()
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


# ---------------------------------------------------------------------------
# PII scan / redaction
# ---------------------------------------------------------------------------

#: detection patterns — shared verbatim with the DuckDB oracles
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d[\d-]{6,14}\d"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    redact: bool = True,
) -> DataFrame:
    """(id, n_emails, n_phones, n_ips[, redacted]) — regex PII
    detection with optional redaction to ``[EMAIL]``/``[PHONE]``/
    ``[IP]`` placeholders.

    Redaction order is email → ip → phone: the email pattern can
    contain dots/digits that the ip pattern would re-match, so the
    longest / most specific class is removed first. Everything is
    ``regexp_count`` + ``regexp_replace`` — scan-stage codegen, zero
    shuffles at any scale.
    """
    t = F.col(text_col)
    cols = [
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
    ]
    if redact:
        red = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
        red = F.regexp_replace(red, IPV4_RE, "[IP]")
        red = F.regexp_replace(red, PHONE_RE, "[PHONE]")
        cols.append(red.alias("redacted"))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# Gopher/C4-style quality rules
# ---------------------------------------------------------------------------


def quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_unique_word_frac: float = 0.1,
    max_repeated_2gram_frac: float = 0.95,
    max_symbol_frac: float = 0.2,
) -> DataFrame:
    """Per-document repetition / shape filters in the style of the
    Gopher rules (Rae et al. 2021 §A1.1) and C4 heuristics, as one
    codegen'd pass:

    - ``n_words`` within [min_words, max_words];
    - ``mean_word_len`` within a sane window;
    - ``unique_word_frac`` = |distinct words| / |words| above a floor
      (word-salad and boilerplate collapse to few types);
    - ``repeated_2gram_frac`` = 1 - |distinct 2-grams| / |2-grams|
      below a cap (catches looping/templated text);
    - ``symbol_frac`` = non-alphanumeric-non-space chars / chars
      below a cap.

    Returns every input row with the metric columns, per-rule
    booleans folded into ``keep`` (AND of all rules). Ratios are
    rounded to 6 dp so engine float quirks can't flip a hash.
    """
    # stage 1: tokenize ONCE into real columns so every metric reads the
    # same arrays — without this, each expression repeating F.split /
    # the grams transform re-evaluates it per reference (subexpression
    # elimination doesn't always reach inside HOF lambdas). Projections
    # fuse in whole-stage codegen: still one pass, zero shuffles.
    t = F.col(text_col)
    words_c = F.split(t, " ")
    staged = df.select(
        id_col,
        F.size(words_c).alias("__nw"),
        F.length(t).alias("__nc"),
        words_c.alias("__words"),
        # count symbol chars directly — regexp_count avoids building the
        # stripped copy of every document that regexp_replace+length did
        F.regexp_count(t, F.lit(r"[^A-Za-z0-9 ]")).alias("__nsym"),
    )
    words = F.col("__words")
    n_words = F.col("__nw")
    n_chars = F.col("__nc")
    grams = F.transform(
        F.slice(words, 1, F.greatest(n_words - 1, F.lit(0))),
        lambda w, i: F.concat_ws(" ", w, F.element_at(words, i + 2)),
    )
    uniq_frac = F.round(
        F.coalesce(F.try_divide(F.size(F.array_distinct(words)), n_words), F.lit(0.0)),
        6,
    )
    rep2_frac = F.round(
        F.coalesce(
            F.lit(1.0) - F.try_divide(F.size(F.array_distinct(grams)), F.size(grams)),
            F.lit(0.0),
        ),
        6,
    )
    sym_frac = F.round(
        F.coalesce(F.try_divide(F.col("__nsym"), n_chars), F.lit(0.0)), 6
    )
    mean_wl = F.round(F.try_divide(n_chars - (n_words - 1), n_words), 6)
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (uniq_frac >= min_unique_word_frac)
        & (rep2_frac <= max_repeated_2gram_frac)
        & (sym_frac <= max_symbol_frac)
    )
    return staged.select(
        id_col,
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        uniq_frac.alias("unique_word_frac"),
        rep2_frac.alias("repeated_2gram_frac"),
        sym_frac.alias("symbol_frac"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + keep-best dedup
# ---------------------------------------------------------------------------

#: query parameters that never change page identity
TRACKING_PARAM_RE = r"^(utm_[a-z]+|ref|fbclid|gclid|mc_cid|mc_eid)="


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL column: lowercase, scheme and leading
    ``www.`` stripped, fragment dropped, tracking query parameters
    removed, remaining parameters sorted, trailing slash trimmed.

    Pure string expressions — usable inside any scan stage.
    """
    u = F.lower(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    path = F.substring_index(u, "?", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.when(u.contains("?"), F.substring_index(u, "?", -1)).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.sort_array(kept), "&")
    return F.when(qs != "", F.concat_ws("?", path, qs)).otherwise(path)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL: (canonical_url, canonical_id,
    n_dupes, best_quality?).

    ``canonical_id`` keeps the lowest id; with ``quality_col`` the
    group also reports the best quality seen, so callers can join
    back and keep the best-quality capture per page. Single hash
    aggregation — partial min/max map-side, one exchange on the
    canonical key.
    """
    g = df.groupBy(canonical_url(url_col).alias("canonical_url"))
    aggs = [
        F.min(id_col).alias("canonical_id"),
        (F.count("*") - 1).alias("n_dupes"),
    ]
    if quality_col is not None:
        aggs.append(F.max(quality_col).alias("best_quality"))
    return g.agg(*aggs)


def cross_split_contamination(
    docs: DataFrame,
    pairs: DataFrame,
    weights: "dict[str, float] | None" = None,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    salt: str = "split",
    labels: DataFrame | None = None,
) -> DataFrame:
    """(train_id, eval_id, eval_split) — near-duplicate pairs that
    CROSS the train/eval split boundary: the leakage audit every
    benchmark-quality pipeline runs after splitting. A test document
    whose near-twin sits in train inflates eval scores without the
    model generalizing; this surfaces exactly those pairs.

    ``pairs`` is any near-dup pair frame (MinHash-LSH candidates,
    Jaccard- or containment-verified pairs, embedding near-dups);
    composition with :func:`impuls_spark.llm.sampling.hash_split`
    keeps the split assignment identical to the one used for training
    — PROVIDED ``weights`` is the same *ordered* mapping (hash_split
    assigns cumulative ranges in insertion order, so a reordered but
    value-equal dict silently labels rows differently and corrupts the
    audit). When the training pipeline already materialized its split,
    pass that frame as ``labels`` ((id_col, 'split') columns) instead
    of re-deriving; ``weights``/``salt`` are then ignored.
    Output is normalized so the train-side id is always first and only
    train↔non-train pairs survive (eval↔eval duplication is a
    different, benign problem).

    Plan shape: two broadcast-sized column derivations (the split label
    is a scan-stage CASE — no join against a split table) + the pair
    frame; one row per offending pair.
    """
    from .sampling import hash_split

    if labels is None:
        labels = hash_split(
            docs.select(id_col), weights=weights, key_col=id_col, salt=salt
        )
    else:
        labels = labels.select(id_col, "split")
    la = labels.select(
        F.col(id_col).alias(id_a), F.col("split").alias("__sa")
    )
    lb = labels.select(
        F.col(id_col).alias(id_b), F.col("split").alias("__sb")
    )
    tagged = pairs.join(la, id_a).join(lb, id_b)
    a_train = tagged.filter(
        (F.col("__sa") == "train") & (F.col("__sb") != "train")
    ).select(
        F.col(id_a).alias("train_id"),
        F.col(id_b).alias("eval_id"),
        F.col("__sb").alias("eval_split"),
    )
    b_train = tagged.filter(
        (F.col("__sb") == "train") & (F.col("__sa") != "train")
    ).select(
        F.col(id_b).alias("train_id"),
        F.col(id_a).alias("eval_id"),
        F.col("__sa").alias("eval_split"),
    )
    return a_train.unionByName(b_train)


# ---------------------------------------------------------------------------
# Encoding quality / mojibake detection
# ---------------------------------------------------------------------------

#: detection patterns — shared verbatim with the DuckDB oracles.
#: REPLACEMENT: U+FFFD, what lossy decoders leave behind. CONTROL: C0
#: controls except tab/newline/CR. MOJIBAKE: the classic
#: UTF-8-bytes-decoded-as-Latin-1/cp1252 digraphs ("\u00c3" + Latin-1
#: supplement = mangled accented letter; "\u00e2\u20ac" + anything =
#: mangled curly punctuation; "\u00c2" + NBSP-range = mangled C2 pair).
REPLACEMENT_RE = "\ufffd"
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
MOJIBAKE_RE = (
    "(?:\u00c3[\u0080-\u00bf]|\u00e2\u20ac.|\u00c2[\u00a0-\u00bf])"
)


def encoding_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars, n_replacement, n_control, n_mojibake, enc_score) —
    byte-sanity signals for crawled text: replacement characters from
    lossy decoding, stray C0 control characters, and the double-decode
    (UTF-8 read as Latin-1/cp1252) digraph artifacts. ``enc_score`` in
    [0, 1] is 1 minus 10x the summed artifact density (clamped) — the
    drop-or-refetch signal an ingest pipeline thresholds on.

    Pure scan-stage regexp_count expressions — one pass, no shuffle,
    patterns shared verbatim with the oracle so both engines count
    identically.
    """
    t = F.col(text_col)
    n = F.length(t)
    n_rep = F.regexp_count(t, F.lit(REPLACEMENT_RE))
    n_ctl = F.regexp_count(t, F.lit(CONTROL_RE))
    n_moj = F.regexp_count(t, F.lit(MOJIBAKE_RE))
    density = F.coalesce(
        F.try_divide(n_rep + n_ctl + n_moj, n), F.lit(0.0)
    )
    return df.select(
        id_col,
        n.alias("n_chars"),
        n_rep.alias("n_replacement"),
        n_ctl.alias("n_control"),
        n_moj.alias("n_mojibake"),
        F.round(F.greatest(F.lit(0.0), 1 - density * 10), 6).alias("enc_score"),
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff
# ---------------------------------------------------------------------------

def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status) — the release audit between two corpus snapshots:
    ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (both, different content hash), ``unchanged``. The
    datasheet delta every corpus version bump ships with, and the input
    to incremental reprocessing (only added ∪ changed re-enter the
    pipeline).

    One full-outer hash-join on the id; text reduces to md5 before the
    shuffle so the join carries 32-byte hashes, never documents.
    """
    o = old_df.select(F.col(id_col), F.md5(F.col(text_col)).alias("__ho"))
    n = new_df.select(F.col(id_col), F.md5(F.col(text_col)).alias("__hn"))
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("__ho").isNull(), F.lit("added"))
            .when(F.col("__hn").isNull(), F.lit("removed"))
            .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def dup_rate_by_source(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_dupes, dup_rate) — the curation dashboard
    metric per ingest source: how many of a source's documents are
    exact duplicates of an earlier document anywhere in the corpus
    (canonical = lowest id per content hash, same convention as
    :func:`impuls_spark.llm.dedup.exact_duplicate_groups`).

    A source whose dup_rate spikes is re-crawling content the corpus
    already holds — the signal that gates its ingest budget. Plan
    shape: text reduces to md5 in the scan stage, one hash aggregate
    per content hash (map-side combined), a hash join back on the
    32-char digest, then a source-level aggregate; the join carries
    (hash, count, canonical) — never document text — and nothing is
    quadratic or driver-side.
    """
    rows = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("__id"),
        F.md5(F.col(text_col)).alias("__h"),
    )
    groups = rows.groupBy("__h").agg(
        F.count("*").alias("__cnt"), F.min("__id").alias("__canon")
    )
    dup = (F.col("__cnt") > 1) & (F.col("__id") != F.col("__canon"))
    return (
        rows.join(groups, "__h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(dup.cast("long")).alias("n_dupes"),
            F.round(F.avg(dup.cast("double")), 6).alias("dup_rate"),
        )
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, changed, n_chars_norm, norm_hash) — canonical text
    normalization, the stage that runs BEFORE any hash-based dedup so
    that trivially-different encodings of the same document collide:
    tabs/newlines become spaces, space runs collapse, edges trim, case
    folds to lower. Emits the md5 of the normalized text rather than
    the text itself (verification never ships documents) plus a
    ``changed`` flag so the pipeline can report how much of the corpus
    was touched.

    Wholly scan-stage column expressions — a narrow projection with no
    shuffle, no UDF, applied at whatever point the corpus is already
    being read. The exact normalization sequence is part of the corpus
    contract: it is reproduced operator-for-operator in the DuckDB
    oracle, and changing it invalidates downstream content hashes.
    """
    t = F.col(text_col)
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(t, "[\\t\\n\\r]+", " "), "  +", " "
            )
        )
    )
    return df.select(
        F.col(id_col),
        (norm != t).alias("changed"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("norm_hash"),
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """(cluster_id, kept_id, kept_score, n_members) — the best-quality
    representative of each near-duplicate cluster, ties broken toward
    the smallest id.

    The selection step real dedup pipelines run after clustering:
    rather than keeping the arbitrary canonical (smallest-id) member,
    keep the member a quality model ranks highest — the cluster's
    best capture survives, the rest are dropped. ``clusters`` is any
    (id, cluster) frame (:func:`impuls_spark.llm.dedup.duplicate_clusters`);
    ``scored`` any (id, score) frame (:func:`impuls_spark.llm.text.quality_scores`).

    Plan shape: one id-keyed join (cluster membership is a projection
    of the corpus, AQE broadcasts the smaller side) feeding ONE hash
    aggregate — ``max_by`` over the (score, −id) struct picks the
    winner with map-side partial aggregation, so no per-cluster sort
    and no window; cost is a single exchange on ``cluster_col``.
    """
    j = clusters.select(id_col, cluster_col).join(
        scored.select(id_col, score_col), id_col
    )
    order = F.struct(
        F.col(score_col).alias("s"), (-F.col(id_col)).alias("i")
    )
    return j.groupBy(cluster_col).agg(
        F.max_by(F.col(id_col), order).alias("kept_id"),
        F.max(score_col).alias("kept_score"),
        F.count(F.lit(1)).alias("n_members"),
    )


def normalize_scores(
    df: DataFrame,
    score_col: str,
    group_cols: Sequence[str],
    id_col: str = "doc_id",
    method: str = "zscore",
) -> DataFrame:
    """Per-group score standardization: ``zscore`` ((x − mean)/std,
    sample std) or ``minmax`` ((x − min)/(max − min)), the step that
    makes quality scores comparable ACROSS groups before a global
    threshold or mixture weighting (a 0.6 from a verbose source and a
    0.6 from a terse one rarely mean the same thing raw).

    Output: (id, groups, score, score_norm), ``score_norm`` rounded to
    6 places and 0.0 where the group is degenerate (zero variance /
    single value — every member sits at the group's center).

    Plan shape: one map-side-combinable aggregate per group (means,
    stds, extrema are all partial-friendly) broadcast-joined back, the
    normalization itself a scan-stage projection — two exchanges
    total, nothing sorted.
    """
    if method not in ("zscore", "minmax"):
        raise ValueError(f"method must be zscore|minmax, got {method!r}")
    group_cols = list(group_cols)
    x = F.col(score_col).cast("double")
    if method == "zscore":
        stats = df.groupBy(*group_cols).agg(
            F.avg(x).alias("__m"), F.stddev(x).alias("__s")
        )
        norm = F.try_divide(x - F.col("__m"), F.col("__s"))
    else:
        stats = df.groupBy(*group_cols).agg(
            F.min(x).alias("__lo"), F.max(x).alias("__hi")
        )
        norm = F.try_divide(x - F.col("__lo"), F.col("__hi") - F.col("__lo"))
    joined = df.select(id_col, *group_cols, score_col).join(
        F.broadcast(stats), group_cols
    )
    return joined.select(
        id_col,
        *group_cols,
        score_col,
        F.round(F.coalesce(norm, F.lit(0.0)), 6).alias("score_norm"),
    )


def quantile_filter(
    df: DataFrame,
    score_col: str,
    group_cols: Sequence[str],
    q: float,
    keep: str = "above",
) -> DataFrame:
    """Keep the rows at or beyond their group's exact ``q``-quantile of
    ``score_col`` — "top 30 % quality per language" realized as a
    per-group threshold, not a per-group rank: every row keeps or
    drops by comparing against ONE number, so the decision is stable
    under appends that don't move the quantile and needs no per-group
    sort of the corpus.

    Output: the input columns plus ``threshold`` (the group's cut).

    Plan shape: the exact interpolated quantile is a per-group
    aggregate (grouping keys are dimension-sized — same adjudication
    as length_quantiles), broadcast back, filter in the scan stage.
    Exact rather than ``percentile_approx`` so the cut is
    engine-portable and verifiable.
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be above|below, got {keep!r}")
    group_cols = list(group_cols)
    thresholds = df.groupBy(*group_cols).agg(
        F.round(F.expr(f"percentile({score_col}, {q})"), 6).alias("threshold")
    )
    joined = df.join(F.broadcast(thresholds), group_cols)
    cmp = (
        F.col(score_col) >= F.col("threshold")
        if keep == "above"
        else F.col(score_col) <= F.col("threshold")
    )
    return joined.filter(cmp)
