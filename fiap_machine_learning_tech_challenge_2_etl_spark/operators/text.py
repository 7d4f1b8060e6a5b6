"""Text analysis operators for LLM training-data pipelines (extension
surface; north star). All hot-path logic is built-in JVM expressions —
splits, regexes, array lambdas, md5 — no Python UDFs, so the whole stage
stays inside whole-stage codegen and scales linearly with no shuffle.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punct/stopword ratios), language ID (stopword-overlap heuristic),
document fingerprinting (md5 content hash, full + 60-bit numeric).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.util import spread

# BPE-ish pretokenizer: word pieces or single non-space punctuation — the
# shape GPT-2-style byte-pair pretokenization produces (public regex idiom).
BPE_TOKEN_RE = r"\w+|[^\w\s]"

# Tiny public stopword lists (top function words per language) for the
# language-ID heuristic. Deliberately small: the heuristic is a ratio
# argmax, not a classifier.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "zu", "von", "mit"),
    "pt": ("o", "a", "de", "que", "e", "em", "um", "uma", "para", "com"),
}


def normalize_text(col: str | Column) -> Column:
    """Lowercase + whitespace-collapse + trim — the canonical form used by
    fingerprinting and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def ws_tokens(col: str | Column) -> Column:
    """Whitespace tokenization."""
    return F.split(normalize_text(col), " ")


def add_token_stats(
    df: DataFrame, column: str = "text", toks_col: str | None = None
) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + char len.

    ``toks_col`` names an existing tokens-array column to reuse — composite
    pipelines tokenize the corpus ONCE and share the array across stats/
    quality/language stages instead of re-splitting per operator."""
    toks = F.col(toks_col) if toks_col else ws_tokens(column)
    return spread(df).withColumns(
        {
            "n_chars_calc": F.length(F.col(column)).cast("long"),
            "n_ws_tokens": F.array_size(toks).cast("long"),
            "n_bpe_tokens": F.array_size(
                F.regexp_extract_all(F.col(column), F.lit(BPE_TOKEN_RE), 0)
            ).cast("long"),
        }
    )


def add_quality_score(
    df: DataFrame, column: str = "text", toks_col: str | None = None
) -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean word
    length, and a composite [0,1] score. Heuristics follow the public
    Gopher/C4-style quality-filter recipes (doc length bounds, symbol ratio,
    stop-word presence)."""
    df = spread(df)
    # Stage the token array and ratios as named columns (same reason as
    # add_language_id: inlining re-expands the split tree per consumer —
    # and predicate pushdown would copy the whole composite into filters).
    tname = toks_col or "__toks"
    staged = df if toks_col else df.withColumn("__toks", ws_tokens(column))
    toks = F.col(tname)
    n_tok = F.array_size(toks)
    n_chars = F.length(F.col(column))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(column), r"[^\w\s]", ""))
    sw = F.lit(list(STOPWORDS["en"]))
    n_stop = F.array_size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    mean_wl = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
        / F.greatest(n_tok, F.lit(1))
    )
    staged = staged.withColumns(
        {
            "__punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
            "__stop_ratio": n_stop / F.greatest(n_tok, F.lit(1)),
            "__mean_wl": mean_wl,
        }
    )
    # composite: reward moderate length + some stopwords, punish symbol soup
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(F.col("__stop_ratio") * F.lit(5.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(F.col("__punct_ratio") * F.lit(4.0), F.lit(1.0)))
        * 0.2
    )
    return staged.withColumns(
        {
            "punct_ratio": F.round(F.col("__punct_ratio"), 6),
            "stopword_ratio": F.round(F.col("__stop_ratio"), 6),
            "mean_word_len": F.round(F.col("__mean_wl"), 6),
            "quality_score": F.round(score, 6),
        }
    ).drop(
        *([] if toks_col else ["__toks"]),
        "__punct_ratio",
        "__stop_ratio",
        "__mean_wl",
    )


def add_language_id(
    df: DataFrame, column: str = "text", toks_col: str | None = None
) -> DataFrame:
    """Language ID: stopword-overlap ratio per language, argmax with
    deterministic (alphabetical) tiebreak. N-gram-free heuristic that is
    exactly replicable in the SQL oracle."""
    df = spread(df)

    def _membership(sw_lit):
        # single-arg lambda via closure: a 2-arg lambda would make Spark
        # pass the array index as the second argument
        return lambda t: F.array_contains(sw_lit, t)

    # Stage tokenization and per-language ratios as NAMED columns, then
    # argmax over the column references. Inlining the raw expressions into
    # the greatest + case chain re-expands the split/filter tree ~40x
    # (CollapseProject keeps staged columns separate because duplicating
    # non-cheap expressions is against its cost rule) — staging cut this
    # operator's plan from thousands of expression nodes to dozens.
    tname = toks_col or "__toks"
    staged = df if toks_col else df.withColumn("__toks", ws_tokens(column))
    n_tok = F.greatest(F.array_size(tname), F.lit(1))
    staged = staged.withColumns(
        {
            f"__s_{lang}": F.array_size(
                F.filter(tname, _membership(F.lit(list(sw))))
            )
            / n_tok
            for lang, sw in STOPWORDS.items()
        }
    )
    sc = {lang: F.col(f"__s_{lang}") for lang in STOPWORDS}
    # argmax via greatest + case chain (alphabetical order = tiebreak),
    # over the UNROUNDED ratios (matches the SQL oracle's argmax)
    best = F.greatest(*sc.values())
    pred = F.lit(None).cast("string")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(sc[lang] == best, F.lit(lang)).otherwise(pred)
    out = staged.withColumns(
        {f"score_{lang}": F.round(sc[lang], 6) for lang in STOPWORDS}
    )
    out = out.withColumn(
        "lang_pred", F.when(best > 0, pred).otherwise(F.lit("unknown"))
    )
    return out.drop(
        *([] if toks_col else ["__toks"]),
        *[f"__s_{lang}" for lang in STOPWORDS],
    )


WINNOW_POS_MAX = (1 << 20) - 1  # packed-key position field; docs <1M chars


def winnowing_fingerprints(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — public algorithm): hash every character k-gram of the
    normalized text, slide a window of ``window`` consecutive hashes, keep
    the minimal hash per window (rightmost on ties), dedupe the selections.
    Guarantees a shared fingerprint for any shared substring of length
    >= window+k-1 — the standard local near-copy detector.

    Distributed formulation: k-grams via posexplode (the per-gram md5 is
    vectorized JVM-side; a Karp-Rabin rolling hash is a single-node
    micro-optimization — the contract is the selected-fingerprint set, not
    the hashing loop), then (hash, position) packed into ONE 60-bit key
    ``hash<<20 | (POS_MAX - pos)`` so a plain windowed ``min`` implements
    argmin-with-rightmost-tiebreak identically here and in the SQL oracle.
    Only complete windows select (classical winnowing), so docs shorter
    than window+k-1 chars yield no rows. Output: (id, pos, fp)."""
    # bind the normalized text ONCE as a lambda variable (single-element
    # array wrapper): referencing the normalize expression inside the
    # per-position lambda would re-run the regex per character position —
    # O(len^2) per doc
    gram_arr = F.flatten(
        F.transform(
            F.array(normalize_text(column)),
            lambda nm: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.length(nm) - (k - 1), F.lit(1))
                ),
                lambda i: nm.substr(i, F.lit(k)),
            ),
        )
    )
    grams = spread(df, by=id_col).select(
        F.col(id_col),
        F.posexplode(gram_arr).alias("pos0", "gram"),
    )
    h40 = F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10).cast("long")
    pos = (F.col("pos0") + 1).cast("long")
    keys = grams.select(
        F.col(id_col),
        pos.alias("pos"),
        (h40 * F.lit(1 << 20).cast("long") + (F.lit(WINNOW_POS_MAX) - pos)).alias(
            "key"
        ),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    sel = keys.withColumn("k", F.min("key").over(w)).filter(F.col("pos") >= window)
    return sel.select(
        F.col(id_col),
        (F.lit(WINNOW_POS_MAX) - F.col("k").bitwiseAND(F.lit(WINNOW_POS_MAX)))
        .cast("long")
        .alias("pos"),
        F.shiftright(F.col("k"), 20).alias("fp"),
    ).distinct()


def add_fingerprint(df: DataFrame, column: str = "text") -> DataFrame:
    """Document fingerprint: md5 of normalized text (exact-dedup key) plus a
    60-bit numeric fingerprint (15 hex chars -> bigint) for compact
    join keys / partitioning at scale."""
    h = F.md5(normalize_text(column))
    return df.withColumns(
        {
            "fingerprint": h,
            "fingerprint60": F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        }
    )


# Public PII-shaped patterns (email; simple international phone). Kept to
# the regex subset Java regex and RE2 interpret identically, so the same
# pattern string drives both the Spark operator and a SQL oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def add_pii_redaction(
    df: DataFrame,
    column: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII scrub for training corpora: replace each pattern class with a
    typed placeholder token and count the matches per class.

    Extension surface (north star): the reference cleans columns
    (etl/transform_1.py:60-79) but has no content redaction. All work is
    JVM regexp_replace / regexp_extract_all — per-row, no shuffle, scales
    linearly; at 100 TB this runs inside the scan's codegen stage.
    Placeholder is ``<CLASS>`` so downstream tokenizers see one stable
    token per redaction.
    """
    patterns = patterns or {"email": EMAIL_RE, "phone": PHONE_RE}
    out = df
    red = F.col(column)
    for name, pat in patterns.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0))),
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return out.withColumn("redacted", red)


def add_repetition_stats(
    df: DataFrame,
    column: str = "text",
    out_prefix: str = "",
) -> DataFrame:
    """Repetition / boilerplate signals (Gopher-style corpus quality rules):
    fraction of duplicate words and of duplicate word trigrams per document.
    High repetition marks generated/boilerplate text that harms training.

    Pure array-lambda pipeline (split -> transform over an index sequence ->
    array_distinct): zero Python, zero shuffle — the trigram list is never
    exploded, so memory stays O(doc length) per row at any corpus size.

    The token and trigram arrays are MATERIALIZED as staged columns before
    use: referencing the split expression inside the per-index lambda makes
    Catalyst re-split the string on every element access — O(words^2) per
    document, measured 22x slower on the synthetic corpus. Staged columns
    evaluate each array exactly once per row.
    """
    p = out_prefix
    ws_col, tri_col = f"__{p}rep_ws", f"__{p}rep_tri"
    ws = F.col(ws_col)
    n = F.size(ws)
    # guard: sequence(1, n-2) DESCENDS for n < 3 (Spark auto-steps -1),
    # which would fabricate out-of-range trigram indexes on short docs
    tri = F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + 1), F.element_at(ws, i + 2)
        ),
    )).otherwise(F.array().cast("array<string>"))
    n_tri = F.size(F.col(tri_col))
    return (
        df.withColumn(ws_col, F.split(F.col(column), " "))
        .withColumn(tri_col, tri)
        .withColumns(
            {
                f"{p}n_words": n.cast("long"),
                f"{p}dup_word_ratio": F.when(
                    n > 0,
                    F.round(1.0 - F.size(F.array_distinct(ws)) / n.cast("double"), 6),
                ),
                f"{p}dup_trigram_ratio": F.when(
                    n_tri > 0,
                    F.round(
                        1.0
                        - F.size(F.array_distinct(F.col(tri_col)))
                        / n_tri.cast("double"),
                        6,
                    ),
                ),
            }
        )
        .drop(ws_col, tri_col)
    )


def add_char_entropy(
    df: DataFrame,
    column: str = "text",
    out_prefix: str = "",
) -> DataFrame:
    """Character-level Shannon entropy + bigram diversity — the two
    cheapest gibberish/boilerplate detectors a corpus quality gate runs
    (low entropy = repeated filler, near-zero bigram diversity = copy
    loops; cf. Gopher/C4 quality-rule families).

    Adds ``{p}char_entropy`` (bits, 6dp), ``{p}n_distinct_bigrams`` and
    ``{p}n_bigrams`` (exact integers, so the ratio is reconstructable
    without float ambiguity).

    Cross-engine determinism: entropy terms depend only on each character's
    COUNT, so folding the count array in ASCENDING SORTED order makes the
    IEEE-754 summation sequence identical in any engine that replays the
    same sort — the DuckDB oracle mirrors it with
    ``list_sort`` + ``list_transform`` + sequential ``list_sum``. (The
    oracle derives counts per distinct char — O(d*n), fine at oracle
    scale; the count MULTISET is identical either way.)

    Scale posture: pure JVM array expressions (split/sort/filter/
    aggregate) inside whole-stage codegen — map-only, no shuffle, no
    Python. Counts come from RUN LENGTHS of the sorted char array
    (boundary positions -> adjacent differences), O(len log len) per row
    instead of the naive O(distinct * len) scan-per-distinct-char
    (measured 2.5x faster on the sf0.1 corpus).
    """
    p = out_prefix
    ch_col, srt_col, pos_col, cnt_col, bg_col = (
        f"__{p}ent_ch",
        f"__{p}ent_srt",
        f"__{p}ent_pos",
        f"__{p}ent_cnt",
        f"__{p}ent_bg",
    )
    chars = F.filter(F.split(F.col(column), ""), lambda x: x != F.lit(""))
    nch = F.size(F.col(ch_col))
    # run boundaries in the sorted char array: position i starts a new run
    # iff i == 1 or sorted[i] != sorted[i-1]
    bounds = F.when(
        nch > 0,
        F.filter(
            F.sequence(F.lit(1), nch),
            lambda i: (i == 1)
            | (F.element_at(F.col(srt_col), i) != F.element_at(F.col(srt_col), i - 1)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    # run length = next boundary - this boundary (n+1 sentinel appended)
    padded = F.concat(F.col(pos_col), F.array((nch + 1).cast("int")))
    counts = F.when(
        F.size(F.col(pos_col)) > 0,
        F.array_sort(
            F.transform(
                F.sequence(F.lit(1), F.size(F.col(pos_col))),
                lambda j: F.element_at(padded, j + 1) - F.element_at(padded, j),
            )
        ),
    ).otherwise(F.array().cast("array<int>"))
    n = F.size(F.col(ch_col)).cast("double")
    # fold by SUBTRACTION, not negate-after: 0-0 is +0.0 (negating a zero
    # sum yields -0.0, which canonicalizes differently across engines), and
    # IEEE negation being exact makes this bit-identical to DuckDB's
    # 0.0 - list_sum(terms) over the same sorted term order
    entropy = F.aggregate(
        F.col(cnt_col),
        F.lit(0.0),
        lambda acc, k: acc - (k / n) * F.log2(k / n),
    )
    bigrams = F.when(
        nch >= 2,
        F.transform(
            F.sequence(F.lit(1), nch - 1),
            lambda i: F.concat(
                F.element_at(F.col(ch_col), i), F.element_at(F.col(ch_col), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # NOTE: deliberately NO spread() here — measured SLOWER at sf0.1
    # (3.9s vs 2.5s): the per-row array work allocates heavily and 32
    # concurrent tasks GC-thrash a single local JVM; on a real cluster the
    # input spans many files and the map-only op parallelizes naturally.
    return (
        df.withColumn(ch_col, chars)
        .withColumn(srt_col, F.array_sort(F.col(ch_col)))
        .withColumn(pos_col, bounds)
        .withColumn(cnt_col, counts)
        .withColumn(bg_col, bigrams)
        .withColumns(
            {
                f"{p}char_entropy": F.when(nch > 0, F.round(entropy, 6)).otherwise(
                    F.lit(0.0)
                ),
                # array_distinct measured FASTER here than a sorted-run
                # count (string sort dominates at ~300 bigrams/doc)
                f"{p}n_distinct_bigrams": F.size(
                    F.array_distinct(F.col(bg_col))
                ).cast("long"),
                f"{p}n_bigrams": F.size(F.col(bg_col)).cast("long"),
            }
        )
        .drop(ch_col, srt_col, pos_col, cnt_col, bg_col)
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    column: str = "text",
    keep_raw: bool = False,
) -> DataFrame:
    """Unigram language-model quality score per document (CCNet-style
    perplexity proxy): fit the unigram model ON THE CORPUS ITSELF (token
    counts / total tokens), then score every document by its mean token
    log-probability. Low scores flag gibberish / rare-token noise; high
    scores flag natural (or boilerplate-repetitive) text — the standard
    cheap LM filter run before an expensive model-based one.

    Returns one row per document: ``(id_col, n_toks, avg_logprob)``.

    Cross-engine determinism: each DISTINCT token's log-probability is
    quantized to integer MICRO-NATS (``round(ln(tok_n/total)*1e6)`` of an
    exact small-integer ratio — both engines divide the same exact longs
    and ln the identical double), and per-document scores are BIGINT sums
    of those micro-nats — order-independent, so the value hash survives
    any shuffle. The final mean divides two exact integers.

    Scale posture: one token-keyed hash aggregate builds the vocabulary
    (map-side partial agg collapses in-task duplicates, so shuffle volume
    is O(distinct tokens per task)); the 1-row corpus total broadcasts;
    the stream-to-vocab equi-join shuffles on ``tok`` where Zipf skew is
    real — AQE's skew-join split handles the head tokens (the repo session
    enables AQE), and the per-doc re-aggregate reuses partial aggregation.
    No Python anywhere; every expression is whole-stage-codegen'd."""
    toks = (
        df.select(id_col, F.explode(ws_tokens(column)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_n"))
    total = vocab.agg(F.sum("tok_n").cast("long").alias("total_toks"))
    scored_vocab = vocab.join(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("tok_n") / F.col("total_toks")) * 1e6)
        .cast("long")
        .alias("lp6"),
    )
    scored = (
        toks.join(scored_vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("lp6").cast("long").alias("sum_lp6"),
        )
    )
    if keep_raw:
        # exact integer micro-nat sum, for callers that need overflow-free
        # integer comparisons downstream (e.g. corpus_curation_pipeline's
        # against-the-global-mean filter)
        return scored.select(id_col, "n_toks", "sum_lp6")
    return scored.select(
        id_col,
        "n_toks",
        F.round(F.col("sum_lp6") / F.col("n_toks") / 1e6, 6).alias("avg_logprob"),
    )
