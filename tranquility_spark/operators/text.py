"""Text-analysis operators for training-data pipelines (north-star phase 4).

Every function here is pure built-in Spark SQL expressions (JVM, codegen) —
no Python in the row path — and each has an exactly-equivalent DuckDB SQL
twin in the catalog so the oracle hash-checks it.

- language-ID  — stopword-marker n-gram heuristic (deliberately simple and
  portable; a real model would be a pandas_udf, but the plumbing is the same).
- quality score — length / punctuation / stopword-ratio features.
- token counting — whitespace tokens + a BPE-ish `[a-z]+|[0-9]+` regex count.
- fingerprinting — md5 over normalized text, plus a polynomial rolling hash
  over tokens (both portable to the oracle).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker words per language for the heuristic language-ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
    "es": ["el", "los", "que"],
}

_ROLL_PRIME = 1000000007
_ROLL_BASE = 31


def _count_occurrences(text: Column, word: str) -> Column:
    """Occurrences of a word surrounded by spaces — portable arithmetic form."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))) / len(needle)


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum((_count_occurrences(text, w) for w in words), F.lit(0.0))
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax over marker-word counts; 'unk' when no marker appears.

    Ties break by language order (en, fr, de, es) — the SQL twin uses the same
    chained CASE so the tie-break is identical.
    """
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    max_score = F.greatest(*scores.values())
    expr: Column = F.lit("unk")
    for lang in reversed(langs):  # wrap inside-out so the FIRST language wins ties
        expr = F.when(scores[lang] == max_score, F.lit(lang)).otherwise(expr)
    return F.when(max_score > 0, expr).otherwise(F.lit("unk"))


def token_count(text: Column) -> Column:
    """Whitespace token count via pure length arithmetic (engine-portable)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def word_token_count(text: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs."""
    return F.regexp_count(F.lower(text), F.lit("[a-z]+|[0-9]+"))


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple = (),
) -> DataFrame:
    """Quality-scoring features + a composite score in [0, 1].

    ``passthrough`` names extra input columns to carry into the output
    unchanged (a consumer needing e.g. ``lang`` alongside the score should
    pass it here rather than re-scanning the corpus and joining back on
    the id — code-review r07).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    avg_token_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double")
    stop_hits = sum((_count_occurrences(t, w) for ws in LANG_MARKERS.values() for w in ws), F.lit(0.0))
    stop_ratio = stop_hits / n_tokens.cast("double")
    length_score = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    score = F.round(F.lit(0.5) * length_score + F.lit(0.5) * F.least(stop_ratio * 5, F.lit(1.0)), 6)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_chars.alias("n_chars_measured"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of lowercased, whitespace-collapsed text."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def rolling_token_hash(text: Column) -> Column:
    """Polynomial rolling hash over token lengths+first-letters.

    value(tok) = length(tok) * 96 + (first codepoint mod 96);
    h = fold(h * 31 + value) mod 1e9+7. Exact integer arithmetic, portable to
    DuckDB via list_reduce (the catalog carries the SQL twin).
    """
    toks = F.split(F.trim(text), r"\s+")
    vals = F.transform(toks, lambda tk: F.length(tk) * 96 + F.ascii(tk) % 96)
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _ROLL_BASE + x) % _ROLL_PRIME,
    )


def hash_sample(df, key_col: str, fraction_pct: int, out: "DataFrame" = None):
    """Deterministic, engine-portable sampling: keep rows whose portable hash
    of ``key_col`` lands below ``fraction_pct`` of the hash range.

    Reproducible train/test splits are a pipeline requirement rand() can't
    meet (different executors/retries → different samples). The portable
    multiplicative hash (see operators/partitioning.py) makes the SAME rows
    land in the sample in Spark, DuckDB, or any engine that can do modular
    arithmetic — and the split is stable under repartitioning because it
    depends only on the key.
    """
    from tranquility_spark.operators.partitioning import portable_shard

    return df.filter(portable_shard(F.col(key_col), 100) < fraction_pct)


def pack_sequences(
    df,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    group_col: str = "lang",
    context_len: int = 4096,
):
    """Assign each document to a training-context bin via running token count.

    Greedy sequential packing per group: documents in deterministic
    ``order_col`` order accumulate into bins of ``context_len`` tokens
    (bin = floor((cumsum - n) / context_len) — a document that crosses the
    boundary starts conceptually in its bin). One window (shuffle by group +
    in-partition sort); at 100 TB group by shard-of-corpus instead of a
    low-cardinality column so partitions stay bounded.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        "bin_id", F.floor((cum - F.col(token_col)) / F.lit(context_len)).cast("long")
    )


# PII patterns: deliberately simple/portable regexes (same syntax accepted by
# Spark's regexp_replace and DuckDB's regexp_replace with 'g')
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(text: Column) -> Column:
    """Chained regexp_replace redaction — email → phone → IPv4.

    One narrow JVM expression per pattern; the pattern order matters (emails
    contain digit runs a phone pattern could clip). A production ruleset
    would extend PII_PATTERNS; the operator shape doesn't change.
    """
    out = text
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def top_bigram_repetition(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4/Gopher-style repetition signal: fraction of a doc's bigrams taken by
    its single most frequent bigram.

    explode bigrams → count per (doc, bigram) → max/sum per doc. Two hash
    aggregations, both keyed by doc id (uniform) — scan-bound at 100 TB.
    Boilerplate/spam has top_bigram_frac near 1; clean prose is low.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    per_bigram = (
        df.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_bigram.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_count"),
        )
        .select(
            id_col,
            "n_bigrams",
            "top_bigram_count",
            F.round(F.col("top_bigram_count") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        )
    )


def quality_filter(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 15,
    max_tokens: int = 100000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    max_top_bigram_frac: float = 0.20,
    min_stopword_ratio: float = 0.01,
):
    """Gopher/C4-style composite document filter: per-rule flags + verdict.

    Each rule is a boolean column so downstream can audit WHY a document was
    dropped (the operational requirement of corpus filtering — silent drops
    are undebuggable). Two scans joined on doc id: the cheap per-doc features
    and the bigram-repetition aggregate; both doc-keyed, uniform shuffle.
    """
    feats = quality_features(df, text_col, id_col)
    rep = top_bigram_repetition(df, text_col, id_col).select(id_col, "top_bigram_frac")
    j = feats.join(rep, id_col, "left")
    rules = {
        "pass_token_count": (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens),
        "pass_token_len": (F.col("avg_token_len") >= min_avg_token_len)
        & (F.col("avg_token_len") <= max_avg_token_len),
        "pass_repetition": F.coalesce(
            F.col("top_bigram_frac") <= max_top_bigram_frac, F.lit(True)
        ),
        "pass_stopwords": F.col("stopword_ratio") >= min_stopword_ratio,
    }
    out = j
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    keep = functools_reduce_and([F.col(n) for n in rules])
    return out.withColumn("keep", keep)


def functools_reduce_and(conds):
    from functools import reduce

    return reduce(lambda a, b: a & b, conds)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks.

    The context-window preprocessing step of a training pipeline: chunk k
    covers [k*stride, k*stride + chunk_size), so consecutive chunks overlap
    by chunk_size - stride characters. Implemented as posexplode over a
    per-row sequence of chunk starts — a narrow 1→N fan-out with no shuffle,
    linear in executors at 100 TB (the inverse of pack_sequences). Every
    document emits at least one chunk (empty text → one empty chunk), so an
    anti-join against the chunk table can never silently drop documents.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    n = F.length(F.col(text_col))
    # floor((len-1)/stride) is the last chunk index; greatest(...,0) keeps
    # one (empty) chunk for empty documents instead of sequence(0,-1)
    last = F.greatest(F.floor((n - F.lit(1)) / F.lit(stride)), F.lit(0)).cast("int")
    start = F.col("chunk_id") * stride
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(F.sequence(F.lit(0), last)).alias("chunk_id", "_i"),
        )
        .select(
            id_col,
            "chunk_id",
            start.alias("start_off"),
            F.substring(F.col(text_col), start + 1, F.lit(chunk_size)).alias("chunk"),
        )
        .withColumn("chunk_chars", F.length("chunk"))
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into fixed-size overlapping TOKEN chunks.

    ``chunk_documents``' token-aligned sibling — the chunking a retrieval /
    context-window pipeline actually wants: budgets are counted in tokens,
    and a chunk boundary must never cut a token in half (a char-aligned
    chunk can split a word across two chunks, which poisons both their
    embeddings). Chunk k covers tokens [k*stride, k*stride + chunk_size);
    consecutive chunks overlap by ``chunk_size - stride`` tokens.

    Same plan shape as ``chunk_documents``: tokenize once (whitespace
    split, the txt3 convention), posexplode a per-row sequence of chunk
    starts, slice the token array — a narrow 1→N fan-out, no shuffle,
    linear in executors at 100 TB. Every document emits at least one chunk
    (empty text tokenizes to one empty token, the txt3/token_count
    convention), so chunk-table anti-joins can never silently drop
    documents.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # last chunk = the first whose window reaches the end: ceil((n - size)
    # / stride). chunk1's floor((n-1)/stride) formula would emit a final
    # chunk whenever ANY token starts past the last stride boundary — but
    # with overlap that trailing chunk can be a strict SUBSET of its
    # predecessor's coverage (n=50, 32/24: chunk 2 = tokens [48,50), both
    # already in chunk 1's [24,50)), and ~overlap/stride of all documents
    # would emit one fully redundant chunk to be embedded/indexed/deduped
    # downstream (code-review r8)
    last = F.greatest(
        F.ceil((n - F.lit(chunk_size)) / F.lit(stride)), F.lit(0)
    ).cast("int")
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("__toks"), start + 1, F.lit(chunk_size))
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(F.sequence(F.lit(0), last)).alias("chunk_id", "_i"),
        )
        .select(
            id_col,
            "chunk_id",
            start.alias("start_tok"),
            F.size(piece).cast("long").alias("n_toks"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    min_total_floor: Optional[int] = None,
) -> DataFrame:
    """Corpus-wide word n-gram document frequency — boilerplate detection.

    Repeated n-grams that occur across many documents are boilerplate
    (headers, license blurbs, nav text); dedup pipelines (C4, RefinedWeb)
    compute this table first, then strip or down-weight matching spans.

    Shape at 100 TB: the shingle expansion is a narrow per-row ``transform``
    over the token array (no shuffle, ~|tokens| rows out per doc); the only
    shuffle is the (gram) hash aggregation, which map-side-combines before
    exchange. ``count(DISTINCT doc_id)`` expands to a two-phase agg keyed on
    (gram, doc_id) — whose exchange carries every (gram, doc) occurrence,
    singleton tail included (~95% of grams at open-web scale, see txt10's
    cap note).

    ``min_total_floor``: frequency-floor pre-pass, the open-web scale knob.
    A first total-count agg keyed on ``xxhash64(gram)`` — 8-byte exchange
    rows instead of gram strings, map-side combined to one row per distinct
    gram per partition — finds hash buckets with
    ``n_total >= min_total_floor``; the surviving hash set then filters the
    occurrence stream BEFORE the (gram, doc_id) distinct expansion, so the
    singleton long tail (~95% of grams at open-web scale) never travels
    through the expensive exchange with its doc ids. Hash collisions only
    ADD false survivors (a colliding bucket's count is >= each member's
    true count), never drop true ones, and the final ``n_docs`` filter
    removes them — so for any floor <= ``min_docs`` the result is EXACTLY
    preserved (``n_total >= n_docs``: a gram the floor drops could never
    clear the output filter). Floors above ``min_docs`` prune aggressively
    (changes results — deliberate at scale). The survivor join is left to
    Catalyst/AQE: a high floor yields a small survivor set that broadcasts
    (or injects a runtime Bloom filter), making the tail filter map-side;
    forcing a broadcast here would be wrong for floor=2 at open-web scale
    where survivors are still billions. At bench SF the pre-pass costs more
    than it saves (extra scan + agg over tiny data) — it is OFF by default
    and off in the txt11 catalog entry; flip it on when the singleton tail
    dominates the shuffle.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    # Materialize the token array in its own projection: referencing the
    # split() expression inside the transform() lambda re-evaluates it per
    # gram (no common-subexpression elimination across lambda scopes) —
    # measured 3x slower. element_at per token beats slice(): no per-gram
    # array allocation.
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("w")
    )
    w = F.col("w")
    # starts 1..size-n+1 (element_at is 1-based); when(size<n) guards
    # sequence()'s descending-range behavior (sequence(0,-1) yields [0,-1])
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - n + 1),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = toks.select(F.col(id_col), F.explode(grams).alias("gram"))
    if min_total_floor is not None:
        hashed = exploded.withColumn("gh", F.xxhash64("gram"))
        survivors = (
            hashed.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("bucket_total"))
            .filter(F.col("bucket_total") >= min_total_floor)
            .select("gh")
        )
        exploded = hashed.join(survivors, "gh").drop("gh")
    return (
        exploded.groupBy("gram")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


# Script classes for script_profile: (name, regex char class). Literal
# unicode ranges (not \x{..} escapes) so the same pattern string compiles
# identically under Java regex (Spark) and RE2 (DuckDB). Order is the
# dominance tie-break priority.
SCRIPT_CLASSES = (
    ("latin", "[A-Za-zÀ-ɏ]"),
    ("cjk", "[぀-ヿ一-鿿]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("arabic", "[؀-ۿ]"),
    ("digit", "[0-9]"),
)


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unicode-script character profile + dominant script.

    The multilingual-corpus triage signal that runs BEFORE n-gram lang-ID
    (predict_lang): script counts are alphabet-level facts, so they catch
    wrong-script contamination (e.g. mojibake, mixed-script spam) that a
    marker-word model scores as merely 'unk'. Counts are per-character
    regexp_count projections — narrow JVM expressions, no shuffle, linear
    scan at any corpus size. Dominance uses SCRIPT_CLASSES priority order
    as the deterministic tie-break (first listed wins ties), identical
    CASE logic in the SQL oracle.
    """
    text = F.col(text_col)
    counts = {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat in SCRIPT_CLASSES
    }
    out = df.select(
        F.col(id_col),
        F.length(text).cast("long").alias("n_chars"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    )
    # first-match-wins CASE in priority order: a class dominates when its
    # count is > 0 and >= every other class's count; ties go to the
    # earlier class because its branch is evaluated first. The oracle
    # builds the same CASE, so the tie-break is engine-identical.
    names = [name for name, _ in SCRIPT_CLASSES]
    dom = None
    for name in names:
        cond = F.col(f"n_{name}") > 0
        for other in names:
            if other != name:
                cond = cond & (F.col(f"n_{name}") >= F.col(f"n_{other}"))
        dom = F.when(cond, F.lit(name)) if dom is None else dom.when(cond, F.lit(name))
    return out.withColumn("dominant_script", dom.otherwise(F.lit("other")))


def bm25_scores(
    df: DataFrame,
    query_terms,
    text_col: str = "text",
    id_cols=("doc_id",),
    k1: float = 1.2,
    b: float = 0.75,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Per-unit BM25 scores for a literal query over ANY corpus frame —
    the retrieval unit is whatever ``id_cols`` identifies (documents for
    txt19, (doc_id, chunk_id) chunks for pipe7).

    Cross-engine determinism (the txt19 policy): idf =
    ln((N-df+0.5)/(df+0.5)+1) is the only transcendental and is 6-dp
    rounded; every other step is IEEE double arithmetic with a pinned
    expression tree; per-term scores round to 6 dp and DECIMAL-accumulate
    across query terms. df counts DISTINCT retrieval units per term via
    dropDuplicates (not a composite countDistinct — the same shape both
    dialects express identically).

    Plan: the token explode filters to the query list IN THE SAME SELECT,
    so the shuffle input is |matching tokens|, never |tokens|; N/avgdl
    and the |q|-row idf frame are kilobyte broadcasts. Returns every
    matching unit — callers take their own top-k (TakeOrdered).

    ``stats`` (mergeable family #9, VERDICT r9 #3): a
    :func:`bm25_corpus_stats`-shaped frame supplying df/N/avgdl so
    SERVING never rescans the corpus for its global statistics — only
    the frame being scored is read (for tf/dl, which are per-unit facts
    of the candidates themselves). Scores are bit-identical to the
    rescan form when the stats were built over the same corpus with the
    same tokenizer: the expression trees below are shared verbatim, only
    the df/N/sum_dl SOURCES switch.
    """
    ids = list(id_cols)
    terms = [str(t) for t in query_terms]
    if not terms:
        # isin() with zero args is a py4j error deep in the plan — fail
        # here with intent instead
        raise ValueError("query_terms must be non-empty")
    toks = df.select(
        *ids, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok").isin(*terms))
    dls = df.select(
        *ids, F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("dl")
    )
    if stats is None:
        corpus = dls.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
        dfreq = (
            toks.dropDuplicates(ids + ["tok"])
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("double").alias("df"))
        )
    else:
        # Exactly ONE NULL-token totals row is the bm25_corpus_stats
        # contract; unmerged partials (several totals rows) would fan the
        # broadcast crossJoin out per totals row and silently duplicate
        # scores (ADVICE r10 #4). Aggregate to one row unconditionally so
        # the crossJoin can never fan out, and guard the load-bearing `n`
        # column with raise_error so a malformed stats frame fails fast at
        # execution time (plan-only — no extra driver-side job; `n` feeds
        # idf, so the guard cannot be pruned).
        totals = stats.filter(F.col("tok").isNull()).agg(
            F.count(F.lit(1)).alias("_totals_rows"),
            F.sum("n_units").alias("_n_units"),
            F.sum("sum_dl").alias("_sum_dl"),
        )
        corpus = totals.select(
            F.when(
                F.col("_totals_rows") == 1, F.col("_n_units").cast("double")
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "bm25_scores(stats=...) requires exactly one "
                            "NULL-token totals row, got "
                        ),
                        F.col("_totals_rows").cast("string"),
                        F.lit(
                            " — merge partials with bm25_stats_merge first"
                        ),
                    )
                )
            )
            .alias("n"),
            (F.col("_sum_dl").cast("double") / F.col("_n_units")).alias(
                "avgdl"
            ),
        )
        dfreq = stats.filter(F.col("tok").isin(*terms)).select(
            "tok", F.col("df").cast("double").alias("df")
        )
    tf = toks.groupBy(*ids, "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    idf = dfreq.crossJoin(F.broadcast(corpus)).select(
        "tok",
        F.round(
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
            ),
            6,
        ).alias("idf"),
    )
    term_score = F.round(
        F.col("idf")
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        ),
        6,
    ).cast("decimal(28,6)")
    return (
        tf.join(F.broadcast(idf), "tok")
        .join(dls, ids)
        .crossJoin(F.broadcast(corpus))
        .groupBy(*ids)
        .agg(
            F.round(F.sum(term_score).cast("double"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 corpus statistics — mergeable summary family #9 (VERDICT r9 #3)
# ---------------------------------------------------------------------------
# df, N and sum_dl are plain integer sums over disjoint unit sets, so they
# fit the bloom/CMS partials lifecycle exactly: build per micro-batch, land
# each partial in its own ``batch_id=`` partition (dynamic overwrite ->
# replay REPLACES), sum-merge at read. Merge is bit-identical to a direct
# build over the union PROVIDED batches partition the corpus by retrieval
# unit (each unit ingested exactly once — the same disjointness contract
# every sum-based family documents; a replayed batch is safe, a
# double-INGESTED unit is the caller's bug).

#: one frame, two row kinds: (tok, df, NULL, NULL) per distinct token, and
#: a single (NULL tok) corpus row carrying (n_units, sum_dl)
BM25_STATS_SCHEMA = "tok string, df bigint, n_units bigint, sum_dl bigint"


def bm25_corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    id_cols=("doc_id",),
) -> DataFrame:
    """BM25 corpus statistics over ``df`` (also the per-batch partial
    builder): per-token document frequency rows plus one corpus-totals
    row, using EXACTLY ``bm25_scores``'s whitespace tokenizer so the
    served scores reproduce the rescan form bit-for-bit. Plan: one token
    explode -> distinct -> hash agg for df (map-side combined), one
    narrow agg for the totals row — no all-token shuffle beyond the df
    agg itself, which is the irreducible cost of corpus statistics."""
    ids = list(id_cols)
    toks = df.select(
        *ids, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    df_rows = (
        toks.dropDuplicates(ids + ["tok"])
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .select(
            "tok",
            "df",
            F.lit(None).cast("long").alias("n_units"),
            F.lit(None).cast("long").alias("sum_dl"),
        )
    )
    totals = (
        df.select(F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
        .select(
            F.lit(None).cast("string").alias("tok"),
            F.lit(None).cast("long").alias("df"),
            "n_units",
            "sum_dl",
        )
    )
    return df_rows.unionByName(totals)


def _bm25_stats_fold(parts: DataFrame) -> DataFrame:
    """Sum-merge stats partials: token rows fold by token, the NULL-token
    corpus rows fold together (one NULL group); integer sums keep each
    row kind's NULL columns NULL."""
    return parts.groupBy("tok").agg(
        F.sum("df").alias("df"),
        F.sum("n_units").alias("n_units"),
        F.sum("sum_dl").alias("sum_dl"),
    )


def bm25_stats_merge(partials) -> DataFrame:
    """Merge stats frames — bit-identical to ``bm25_corpus_stats`` on the
    union when the inputs cover disjoint unit sets (integer addition).
    NOT replay-idempotent on its own: partials must come from
    ``bm25_partials_sink``'s ``batch_id=`` partitions (the CMS
    contract)."""
    it = iter(partials)
    out = next(it)
    for p in it:
        out = out.unionByName(p)
    return _bm25_stats_fold(out)


def bm25_partials_sink(
    out_dir: str,
    text_col: str = "text",
    id_cols=("doc_id",),
):
    """foreachBatch sink: one stats partial per micro-batch in its own
    ``batch_id=`` partition (dynamic partition overwrite — replay
    REPLACES, making the non-idempotent sum-merge safe)."""
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_partition(
            bm25_corpus_stats(batch_df, text_col, id_cols), out_dir, batch_id
        )

    return write


def bm25_stats_merge_read(spark, out_dir: str) -> DataFrame:
    """Sum-merge every persisted partial into the lifetime stats frame —
    the serving input for ``bm25_scores(..., stats=...)``."""
    return _bm25_stats_fold(spark.read.parquet(out_dir))


def bm25_stats_prune(
    stats: DataFrame,
    df_floor: int = 1,
    width: int = 1024,
    depth: int = 4,
):
    """Vocabulary-bound the stats frame for open-web scale (families #9 +
    #5 composed): at 100 TB the per-token df table is VOCABULARY-sized —
    typos, hashes and boilerplate fragments make the df<=floor tail the
    overwhelming majority of rows while contributing the least retrieval
    signal. Keep exact rows only where ``df > df_floor``; fold the tail
    into a Count-Min sketch keyed by token with weight=df (bounded
    ``depth*width`` cells however large the vocabulary). Returns
    ``(exact_stats, tail_cms)``.

    Error analysis (the reason this prune is SAFE): CMS point queries
    only ever OVERestimate (sum of non-negative collisions), idf is
    strictly decreasing in df, and the per-term score is increasing in
    idf — so a tail term's served score is only ever UNDERestimated,
    never inflated; frequent-term scores stay bit-exact. The worst
    underestimate is bounded by the CMS guarantee (excess <= e/width *
    sum(tail df) with prob 1 - (1/2)^depth), test-asserted. The tail
    sketch is sum-mergeable (CMS lifecycle), BUT prune AFTER the global
    ``bm25_stats_merge``, never per batch: a token with df=1 in each of
    three batches is globally frequent (df=3) yet would be tail in every
    per-batch prune — the floor is a property of the merged corpus."""
    from tranquility_spark.operators.cms import cms_counters

    exact = stats.filter(F.col("tok").isNull() | (F.col("df") > df_floor))
    tail = stats.filter(F.col("tok").isNotNull() & (F.col("df") <= df_floor))
    return exact, cms_counters(tail, "tok", width, depth, weight_col="df")


def bm25_stats_serve(
    exact_stats: DataFrame,
    tail_cms: DataFrame,
    query_terms,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Query-scoped stats frame from a pruned index: exact rows for query
    terms the exact table still carries (plus the corpus-totals row);
    every other term gets its df from the tail sketch (a |q|-row probe
    against the broadcast counter map — no corpus access). Feed the
    result straight into ``bm25_scores(stats=...)``. A term that never
    occurred may draw a small spurious df from CMS collisions — harmless
    by construction: with no tf rows in the scored frame, its idf row
    joins nothing."""
    from tranquility_spark.operators.cms import cms_estimate

    spark = exact_stats.sparkSession
    terms = [str(t) for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    kept = exact_stats.filter(
        F.col("tok").isNull() | F.col("tok").isin(*terms)
    )
    probe = spark.createDataFrame([(t,) for t in terms], "tok string")
    est = cms_estimate(
        probe, tail_cms, "tok", width=width, depth=depth, out_col="__df_est"
    )
    tail_rows = (
        est.join(
            kept.filter(F.col("tok").isNotNull()).select("tok"),
            "tok",
            "left_anti",
        )
        .filter(F.col("__df_est") > 0)
        .select(
            "tok",
            F.col("__df_est").cast("long").alias("df"),
            F.lit(None).cast("long").alias("n_units"),
            F.lit(None).cast("long").alias("sum_dl"),
        )
    )
    return kept.unionByName(tail_rows)
