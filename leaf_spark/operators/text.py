"""Text-analysis operators for corpus pipelines — all builtin-function
Columns (JVM, codegen) unless noted.

- token_count / bpe_ish_token_count   whitespace + subword-regex counting
- quality_features / quality_score    length, punctuation/digit/upper ratios,
                                      stopword ratio, repetition
- langid_expr                         n-gram/stopword-profile language guess
- fingerprint                         normalized-content hash + winnowed
                                      rolling shingle min-hash
"""

from __future__ import annotations

try:
    # optional: only compression_ratio's pandas-UDF needs it, but its
    # ``pd.Series`` type hints resolve through MODULE globals (PEP 563
    # strings), so the name must exist here — guarded, never required, the
    # rest of the module (and the catalog import chain) works without it
    import pandas as pd
except ImportError:  # pragma: no cover - environment-dependent
    pd = None

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import normalized, spread

# Tiny built-in stopword profiles for the heuristic language id. Real
# deployments would swap in fastText-style models via a pandas UDF; the
# engine-side plumbing (argmax over per-language scores) is identical.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "por", "para", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}


def words_expr(text: Column) -> Column:
    return F.split(normalized(text), " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string → 0)."""
    return F.when(F.length(normalized(text)) == 0, 0).otherwise(F.size(words_expr(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored proxy: alphanumeric runs + each punctuation mark counts,
    long words count ~1 token per 4 chars (subword pieces)."""
    pieces = F.split(F.lower(text), r"[^\p{L}\p{N}]+")
    sub = F.aggregate(
        pieces,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.when(F.length(w) == 0, 0).otherwise(
            F.greatest(F.lit(1), F.ceil(F.length(w) / 4.0))
        ),
    )
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    return (sub + punct).cast("bigint")


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic per-document quality signals (cols, not rows)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,!?;:]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    uniq_ratio = F.size(F.array_distinct(words_expr(text))).cast("double") / F.greatest(
        n_tokens, F.lit(1)
    )
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "avg_token_len": alpha.cast("double") / F.greatest(n_tokens, F.lit(1)),
        "alpha_ratio": alpha.cast("double") / F.greatest(n_chars, F.lit(1)),
        "digit_ratio": digits.cast("double") / F.greatest(n_chars, F.lit(1)),
        "punct_ratio": punct.cast("double") / F.greatest(n_chars, F.lit(1)),
        "upper_ratio": upper.cast("double") / F.greatest(n_chars, F.lit(1)),
        "unique_token_ratio": uniq_ratio,
    }


def quality_score(text: Column) -> Column:
    """Scalar [0,1] score: favors mid-length, low-digit, low-punct,
    vocabulary-diverse documents (C4/Gopher-style heuristics, simplified)."""
    f = quality_features(text)
    length_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), 1.0).otherwise(0.3)
    return (
        0.35 * length_ok
        + 0.25 * (1.0 - F.least(f["digit_ratio"] * 5, F.lit(1.0)))
        + 0.2 * (1.0 - F.least(f["punct_ratio"] * 5, F.lit(1.0)))
        + 0.2 * F.least(f["unique_token_ratio"] * 2, F.lit(1.0))
    )


def langid_expr(text: Column) -> Column:
    """Heuristic language id: argmax over per-language stopword hit counts
    (ties → profile order). Pure builtin expressions: per-language score via
    array_intersect on the distinct word set; argmax via array_max over
    (score, priority) structs."""
    wset = F.array_distinct(words_expr(text))
    entries = []
    n = len(_LANG_PROFILES)
    for rank, (lang, stops) in enumerate(_LANG_PROFILES.items()):
        score = F.size(F.array_intersect(wset, F.array(*[F.lit(s) for s in stops])))
        # higher score wins; on ties earlier profile wins → encode priority
        entries.append(F.struct(score.alias("s"), F.lit(n - rank).alias("prio"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, shingle_words: int = 5) -> Column:
    """Document fingerprint: xxhash64 over the normalized text combined with
    the minimum rolling shingle hash (stable under small reorderings at the
    ends — a 1-hash MinHash 'winnow')."""
    from .dedup import _word_shingles

    full = F.xxhash64(normalized(text))
    sh_min = F.array_min(F.transform(_word_shingles(text, shingle_words), lambda s: F.xxhash64(s)))
    return F.concat_ws(
        ":", F.conv(F.hex(full), 16, 16), F.conv(F.hex(F.coalesce(sh_min, F.lit(0))), 16, 16)
    )


def document_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document profile: all quality features + token counts +
    heuristic language + fingerprint. Single projection — no shuffle."""
    t = F.col(text_col)
    feats = quality_features(t)
    cols = [F.col(id_col)] + [c.alias(k) for k, c in feats.items()]
    cols += [
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        quality_score(t).alias("quality"),
        langid_expr(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    ]
    # spread(): the profile stack (regex + shingle fingerprint per row) is
    # compute-bound; single-file scans otherwise run it on 1-2 cores —
    # no-op at real scale where files exceed parallelism (r12, guide §2)
    return spread(df).select(*cols)


# Gopher-rule thresholds (Rae et al. 2021, table A1 — simplified to the
# signals computable from the driver's documents table).
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style hard quality gates: per doc, each rule's pass/fail plus
    the final keep flag (AND of all rules).

    Rules (ratios are exact integer divisions → bit-deterministic):
      r_len         50 ≤ n_tokens ≤ 100000
      r_avg_len     3 ≤ mean alpha chars per token ≤ 10
      r_symbol      (# + …) / n_chars ≤ 0.1
      r_bullet      ≤ 90% of lines start with a bullet
      r_alpha_word  ≥ 80% of tokens contain at least one alphabetic char
      r_stopword    contains ≥ 2 of the 8 Gopher stopwords

    One narrow projection — embarrassingly parallel, no shuffle; the filter
    composes with any downstream operator before data ever moves.
    """
    t = F.col(text_col)
    w = words_expr(t)
    n_tokens = token_count(t)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^\p{L}]", ""))
    symbol = F.length(F.regexp_replace(t, r"[^#…]", ""))
    lines = F.split(t, "\n")
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    alpha_words = F.size(F.filter(w, lambda x: x.rlike(r"\p{L}")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(w), F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
        )
    )
    rules = {
        "r_len": (n_tokens >= 50) & (n_tokens <= 100000),
        "r_avg_len": (alpha / F.greatest(n_tokens, F.lit(1)) >= 3.0)
        & (alpha / F.greatest(n_tokens, F.lit(1)) <= 10.0),
        "r_symbol": symbol / F.greatest(n_chars, F.lit(1)) <= 0.1,
        "r_bullet": bullet_lines / F.greatest(F.size(lines), F.lit(1)) <= 0.9,
        "r_alpha_word": alpha_words / F.greatest(n_tokens, F.lit(1)) >= 0.8,
        "r_stopword": stop_hits >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    # spread(): three full-text regex scans + array filters per row — the
    # same single-file parallelism fix as document_profile (r12, guide §2)
    return spread(df).select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        *[c.alias(k) for k, c in rules.items()],
        keep.alias("keep"),
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Fixed-size overlapping character chunks — the RAG/pretraining chunk
    prep stage: every document explodes into windows of ``size`` chars
    starting every ``size - overlap`` chars (last chunk may be short; an
    empty doc yields one empty chunk).

    Shuffle-free: chunk starts come from a per-row ``sequence`` + explode,
    a pure narrow projection that scales linearly — the 100 TB shape, no
    data movement until a downstream stage asks for one. Chunk count per
    doc is ``ceil(max(len - overlap, 1) / stride)``, so output size is
    bounded by corpus chars / stride.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap({overlap}) < size({size})")
    stride = size - overlap
    n = F.length(F.col(text_col))
    n_chunks = (
        F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride))
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.expr(f"substring({text_col}, chunk_id * {stride} + 1, {size})").alias(
                "chunk"
            ),
        )
        .withColumn("chunk_len", F.length("chunk").cast("int"))
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    RedPajama/CCNet-style repetitiveness signal: boilerplate and template
    spam compress far below ~0.4, natural prose sits ~0.5-0.8.

    This is a deliberate pandas-UDF (Arrow-batched) kernel: no builtin
    expression can run a general-purpose compressor, and per-row Python
    would be 10-100× slower than the columnar batch path. Shuffle-free —
    composes with gopher_filter before any data movement.
    """
    if pd is None:  # pragma: no cover - environment-dependent
        raise ImportError("compression_ratio requires pandas")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if not t:
                return 1.0
            raw = t.encode("utf-8", "ignore")
            return len(zlib.compress(raw, 6)) / max(len(raw), 1)

        return s.map(one)

    return df.select(F.col(id_col), _ratio(F.col(text_col)).alias("compression_ratio"))


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_nibbles: int = 1,
) -> DataFrame:
    """Content-defined chunking (Rabin/gear-style, word granularity): a chunk
    boundary opens wherever the word's content hash lands in a 1-in-16**n
    bucket, so chunk edges survive insertions/deletions — the property that
    makes CDC the storage-dedup primitive (fixed windows reshuffle every
    boundary after an edit; cf. chunk_text above for the fixed-window op).

    Boundary rule is engine-portable by construction: ``md5(word)`` leading
    hex nibble(s) == '0', P(boundary) = 16**-boundary_nibbles — any SQL
    engine reproduces it bit-exactly (no engine-specific hash).

    Returns (id, chunk_id, chunk_text, n_words, chunk_hash).

    Scale: posexplode is a narrow projection; the only shuffle partitions by
    document id for the running boundary count + reassembly — one shuffle of
    (id, pos, word) rows, partial-aggregated where possible, keyed on the
    document id so chunk assembly never crosses executors per doc. Chunk
    rows out ≈ corpus words / 16**n.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words_expr(F.col(text_col))).alias("pos", "word"),
    )
    is_boundary = (F.col("pos") == 0) | (
        F.substring(F.md5(F.col("word")), 1, boundary_nibbles)
        == "0" * boundary_nibbles
    )
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    chunked = words.withColumn(
        "chunk_id", (F.sum(is_boundary.cast("int")).over(w) - 1).cast("int")
    )
    chunks = chunked.groupBy("id", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda p: p["word"],
            ),
            " ",
        ).alias("chunk_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )
    return chunks.select(
        F.col("id").alias(id_col),
        "chunk_id",
        "chunk_text",
        "n_words",
        F.md5("chunk_text").alias("chunk_hash"),
    )
